package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval-containment) join without the nested-loop explosion.
  *
  * A join whose ONLY predicate is a range test (`start <= ts AND
  * ts < end`, no equality key) gives Spark nothing to hash or sort on —
  * the planner falls back to BroadcastNestedLoopJoin, which is O(|P|·|I|)
  * comparisons and a broadcast of a whole side: the classic 100-TB
  * scale-killer. The standard fix (used by every range-join-optimized
  * engine) is to GRID the time axis: each interval registers in every
  * fixed-width bucket it overlaps, each point lands in exactly one
  * bucket, and the join becomes a plain shuffled EQUI-join on the bucket
  * id followed by the exact range filter. Each (point, interval) pair
  * meets in exactly one bucket — the point's — so no distinct pass is
  * needed.
  *
  * `bucketSeconds` tunes the trade: buckets much wider than the typical
  * interval put many unrelated intervals in each bucket (filter does
  * the work); much narrower replicates each interval across many
  * buckets (shuffle does the work). Set it near the typical interval
  * length. Intervals are assumed bounded: an interval spanning B
  * buckets fans out B rows (B = len/bucketSeconds + 1), so an unbounded
  * interval (a years-long campaign against a seconds grid) needs either
  * a wider grid or the interval split upstream.
  */
object RangeJoin {

  /** Inner-join `points` to every interval containing them:
    * `start <= pointTs < end` (end exclusive). Timestamps compare at
    * microsecond precision. Output: all point columns + all interval
    * columns. */
  def pointInInterval(points: DataFrame, pointTs: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds must be positive, got $bucketSeconds")
    require(!(points.columns ++ intervals.columns).exists(_.startsWith("__rj")),
      "column names starting with __rj are reserved by RangeJoin")
    // a shared column name would make the range-filter col() refs ambiguous
    // (or silently emit duplicate output columns) — fail loudly instead
    val shared = points.columns.toSet intersect intervals.columns.toSet
    require(shared.isEmpty,
      s"points and intervals must not share column names; both have: ${shared.mkString(", ")}")
    val bucketUs = bucketSeconds * 1000000L
    def bucketOf(c: Column): Column = floor(unix_micros(c) / bucketUs)
    val p = points.withColumn("__rjb", bucketOf(col(pointTs)))
    // end is exclusive: an interval ending exactly on a bucket boundary
    // must NOT register in the boundary's bucket. Degenerate intervals
    // (end <= start) contain nothing — and MUST be dropped before the
    // explode: sequence() runs DESCENDING when start > stop, so one
    // inverted row would fan out a bucket row per elapsed bucket
    val i = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("__rjb",
        explode(sequence(bucketOf(col(startCol)),
          floor((unix_micros(col(endCol)) - 1) / bucketUs))))
    p.join(i, Seq("__rjb"))
      .filter(col(startCol) <= col(pointTs) && col(pointTs) < col(endCol))
      .drop("__rjb")
  }
}
