package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** Per-page (lo, hi) key bounds for the first `numPages` pages of
    * `pageSize` rows in `orderCol` order. ONE distributed top-(P·S) pass
    * over the key column only (sort+limit collapses to
    * TakeOrderedAndProject — per-partition heaps, no global sort, no
    * single-task window). `orderCol` must be unique, or a boundary
    * between equal keys would over-fill a page. */
  def pageBounds(df: DataFrame, orderCol: String, pageSize: Int,
                 numPages: Int): Seq[(Any, Any)] = {
    val keys = df.select(col(orderCol)).orderBy(col(orderCol))
      .limit(pageSize * numPages).collect().map(_.get(0))
    requireUniqueKeys(keys, orderCol)
    keys.grouped(pageSize).map(c => (c.head, c.last)).toSeq
  }

  /** The unique-key contract enforced loudly: a duplicate key at a page
    * boundary would silently over-fill a page under the range predicate.
    * Adjacent-equality over the already-sorted keys — O(n), no extra
    * pass. (A duplicate of the LAST key lying beyond the collected window
    * is still invisible; the caller owns true uniqueness.) */
  private def requireUniqueKeys(sortedKeys: Array[Any], orderCol: String): Unit = {
    var i = 1
    while (i < sortedKeys.length) {
      require(sortedKeys(i) != sortedKeys(i - 1),
        s"pageBounds: duplicate key '${sortedKeys(i)}' in order column '$orderCol' — " +
          "page ranges require a unique key")
      i += 1
    }
  }

  /** One page as a key-range predicate — reaches the parquet scan as
    * PushedFilters (min/max row-group pruning), touching only the page's
    * key range instead of ranking the whole table. */
  def pageByRange(df: DataFrame, orderCol: String, lo: Any, hi: Any): DataFrame =
    df.filter(col(orderCol) >= lit(lo) && col(orderCol) <= lit(hi))

  /** The first `numPages` pages as per-page range-predicate DataFrames:
    * one cheap bounds pass, then every page is an independent pushdown
    * scan (the reference's PageNumber loop, feeder.py:22-47, with the
    * page index as the parallelism axis). */
  def pages(df: DataFrame, orderCol: String, pageSize: Int,
            numPages: Int): Seq[DataFrame] =
    pageBounds(df, orderCol, pageSize, numPages).map {
      case (lo, hi) => pageByRange(df, orderCol, lo, hi)
    }

  /** Deterministic page slice (page numbers start at 1, like the
    * reference's PageNumber). Key-range form: no global window. */
  def pageOf(df: DataFrame, orderCol: String, pageSize: Int, page: Int): DataFrame = {
    val bounds = pageBounds(df, orderCol, pageSize, page)
    if (bounds.length < page) df.filter(lit(false))
    else {
      val (lo, hi) = bounds(page - 1)
      pageByRange(df, orderCol, lo, hi)
    }
  }
}
