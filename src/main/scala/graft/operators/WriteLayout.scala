package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Partitioned write layout with bounded file sizes — the 100-TB
  * small-files / giant-files story.
  *
  * A naive `df.write.partitionBy(cols)` has two failure modes at scale:
  * every task holding rows of every partition value writes one file per
  * (task, value) pair — tasks × values tiny files — or, after a
  * `repartition(cols)`, ONE task per value writes one giant file (and a
  * skewed value funnels through a single writer). This operator targets
  * `targetRowsPerFile`:
  *
  *   1. one count aggregate sizes each partition value (map-side
  *      combinable; result is O(values), broadcast back);
  *   2. each row salts into one of ⌈rows/target⌉ slots for its value —
  *      a pure row-hash function, no window, no per-value funnel;
  *   3. a shuffle on (partitionCols, slot) co-locates each slot;
  *   4. `maxRecordsPerFile` caps any file at `target` rows as the hard
  *      backstop (hash slots are approximate: a slot that lands a few
  *      rows over the target splits rather than overflowing).
  *
  * Result: per-value file count ≈ ⌈rows/target⌉ (exact up to hash
  * variance), every file ≤ target rows, and writer parallelism scales
  * with data volume, not with the partition-value count.
  */
object WriteLayout {

  /** Plan the salted layout without writing (assertable): returns the
    * input extended with `__slot`, shuffled on (partitionCols, __slot).
    * `__files` per value = ⌈count/target⌉. */
  def planLayout(df: DataFrame, partitionCols: Seq[String],
                 targetRowsPerFile: Long): DataFrame = {
    require(partitionCols.nonEmpty, "planLayout needs at least one partition column")
    require(targetRowsPerFile > 0, "targetRowsPerFile must be positive")
    val counts = df.groupBy(partitionCols.map(col): _*)
      .agg(count(lit(1)).as("__rows"))
      .withColumn("__files",
        greatest(lit(1L), ceil(col("__rows") / lit(targetRowsPerFile.toDouble))))
      .drop("__rows")
    val dataCols = df.columns.filterNot(partitionCols.contains)
    df.join(broadcast(counts), partitionCols)
      // row-hash slot over the NON-partition columns: deterministic,
      // no window, no per-value single-task funnel
      .withColumn("__slot", pmod(xxhash64(dataCols.map(col): _*), col("__files")))
      .drop("__files")
      .repartition(partitionCols.map(col) :+ col("__slot"): _*)
  }

  /** Write `df` under `path` as parquet partitioned by `partitionCols`
    * with per-file row counts bounded by `targetRowsPerFile`. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       targetRowsPerFile: Long): Unit =
    planLayout(df, partitionCols, targetRowsPerFile)
      .drop("__slot")
      .write
      .option("maxRecordsPerFile", targetRowsPerFile)
      .partitionBy(partitionCols: _*)
      .mode(SaveMode.Overwrite)
      .parquet(path)
}
