package graft.sources


import org.apache.spark.sql.{DataFrame, DataFrameReader, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** JDBC lookup + distributed batch append — the "database feeder" half.
  *
  * Reference behaviour replaced:
  *   - `select phone from recruits_log where wave = N` fetched entirely
  *     to the driver (feeder.py:127-143) → a pushdown JDBC read: the
  *     predicate ships to the database, rows land distributed.
  *   - one INSERT per pandas row on the driver (feeder.py:156-243) →
  *     `df.write.jdbc` batch append: executors write partitions
  *     concurrently with JDBC batching.
  *
  * No JDBC driver jar ships in this container, so these helpers build
  * fully-configured readers/writers (assertable in tests) and only touch
  * the network when actually executed against a real database.
  */
object JdbcFeed {

  /** Derived-table string that ships the wave predicate INTO the
    * database (feeder.py:136's `where wave = N`, but evaluated by the
    * DB instead of filtering after a full-table fetch). */
  def pushdownTable(table: String, keyCol: String, waveCol: String, wave: Int): String =
    s"(select $keyCol from $table where $waveCol = $wave) as __keys"

  /** The existing-keys lookup with the wave predicate pushed down into
    * the database as a subquery (dbtable = derived table). */
  def existingKeysReader(spark: SparkSession, url: String, table: String,
                         keyCol: String, waveCol: String, wave: Int): DataFrameReader =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", pushdownTable(table, keyCol, waveCol, wave))

  /** Partition the prepared batch so `numWriters` tasks append
    * concurrently; pair with [[appendOptions]] (which carries the JDBC
    * batch size) to `.save()` against a live database. */
  def prepareAppend(batch: DataFrame, numWriters: Int): DataFrame =
    batch.repartition(numWriters)

  def appendOptions(url: String, table: String, batchSize: Int = 1000,
                    isolation: String = "READ_COMMITTED"): Map[String, String] = Map(
    "url" -> url,
    "dbtable" -> table,
    "batchsize" -> batchSize.toString,
    "isolationLevel" -> isolation,
  )

  /** Execute the append (requires a JDBC driver on the classpath). */
  def append(batch: DataFrame, url: String, table: String,
             numWriters: Int = 8, batchSize: Int = 1000): Unit =
    prepareAppend(batch, numWriters)
      .write.format("jdbc")
      .options(appendOptions(url, table, batchSize))
      .mode(SaveMode.Append)
      .save()
}
