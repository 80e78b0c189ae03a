package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Paginated ingestion.
  *
  * The reference crawls a REST API page by page on a single thread with
  * `sleep(12)` between calls (feeder.py:22-47). Re-expressed for Spark:
  * the page-index space is the parallelism axis — a plan is built over
  * all pages and tasks fetch pages independently, so a 10k-page export
  * is a 10k-task map, not a 33-hour serial loop.
  */
object PagedReader {

  /** Compose per-page DataFrames (lazy plans) into the full set. For a
    * handful of pages whose fetch itself is driver-side (e.g. one REST
    * call building a local plan each), a `unionAll` keeps Catalyst in
    * charge of the combined plan. */
  def readPages(pages: Seq[DataFrame]): DataFrame =
    pages.reduce(_ unionAll _)

  /** Distributed fetch: one task per page, `fetch` runs on executors.
    * This is the shape for a real paged HTTP/JDBC source: the fetch
    * closure must be serializable and self-contained. */
  def readPagesDistributed[T: org.apache.spark.sql.Encoder](
      spark: SparkSession, numPages: Int, fetch: Int => Iterator[T]): org.apache.spark.sql.Dataset[T] = {
    import spark.implicits._
    spark.range(numPages).as[Long]
      .repartition(math.min(numPages, 256))
      .flatMap(p => fetch(p.toInt))
  }

  /** Deterministic page slice of an ordered DataFrame — models the
    * server's page semantics for tests/oracles (page numbers start at 1,
    * like the reference's PageNumber). */
  def pageOf(df: DataFrame, orderCol: String, pageSize: Int, page: Int): DataFrame = {
    val w = Window.orderBy(col(orderCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") > (page - 1) * pageSize && col("__rn") <= page * pageSize)
      .drop("__rn")
  }
}
