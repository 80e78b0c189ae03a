package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

class RangeJoinSpec extends GraftSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def points = Seq(
    (1L, ts("2024-01-01 10:00:00")), // == start: inclusive
    (2L, ts("2024-01-01 11:30:00")), // inside
    (3L, ts("2024-01-01 12:00:00")), // == end: exclusive
    (4L, ts("2024-01-02 00:00:00")), // outside everything
  ).toDF("p_id", "p_ts")

  private def intervals = Seq(
    (10L, ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00")),
    (20L, ts("2024-01-01 11:00:00"), ts("2024-01-01 13:00:00")),
  ).toDF("i_id", "start_ts", "end_ts")

  test("start inclusive, end exclusive, overlapping intervals each match") {
    val out = RangeJoin.pointInInterval(points, "p_ts", intervals,
        "start_ts", "end_ts", bucketSeconds = 3600)
      .select("p_id", "i_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 10L), (2L, 10L), (2L, 20L), (3L, 20L)))
  }

  test("matches the naive cross-join filter on random data, with no duplicate pairs") {
    val rnd = new scala.util.Random(7)
    val ps = (1 to 300).map(i => (i.toLong,
      new Timestamp(1700000000000L + rnd.nextInt(1000000) * 1000L))).toDF("p_id", "p_ts")
    val is = (1 to 40).map { i =>
      val s = 1700000000000L + rnd.nextInt(900000) * 1000L
      (i.toLong, new Timestamp(s), new Timestamp(s + rnd.nextInt(200000) * 1000L))
    }.toDF("i_id", "start_ts", "end_ts")
    val fast = RangeJoin.pointInInterval(ps, "p_ts", is, "start_ts", "end_ts",
        bucketSeconds = 60)
      .select("p_id", "i_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val naive = ps.crossJoin(is)
      .filter($"start_ts" <= $"p_ts" && $"p_ts" < $"end_ts")
      .select("p_id", "i_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(fast.length == fast.distinct.length, "grid join must not duplicate pairs")
    assert(fast.sorted.toSeq == naive.sorted.toSeq)
  }

  test("an interval ending exactly on a bucket boundary does not register that bucket") {
    // interval [10:00, 11:00) with 3600s buckets: only the 10:00 bucket
    val is = Seq((1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")))
      .toDF("i_id", "start_ts", "end_ts")
    val ps = Seq((1L, ts("2024-01-01 11:00:00"))).toDF("p_id", "p_ts")
    val out = RangeJoin.pointInInterval(ps, "p_ts", is, "start_ts", "end_ts", 3600)
    assert(out.isEmpty, "end-boundary point must not match")
  }

  test("the plan is an equi-join on the bucket — no nested loop, no cartesian") {
    val plan = RangeJoin.pointInInterval(points, "p_ts", intervals,
      "start_ts", "end_ts", 3600).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join must not fall back to a nested loop:\n$plan")
  }

  test("reserved-column collision fails loudly") {
    val bad = points.withColumn("__rjb", lit(1))
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(bad, "p_ts", intervals, "start_ts", "end_ts", 3600)
    }
  }

  test("shared column names between the two sides fail loudly") {
    val bad = intervals.withColumn("p_id", lit(1L))
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points, "p_ts", bad, "start_ts", "end_ts", 3600)
    }
  }

  test("inverted and empty intervals match nothing and fan out nothing") {
    val is = Seq(
      (1L, ts("2024-01-01 10:00:00"), ts("2023-01-01 10:00:00")), // inverted: a year back
      (2L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:00:00")), // empty
    ).toDF("i_id", "start_ts", "end_ts")
    val out = RangeJoin.pointInInterval(points, "p_ts", is, "start_ts", "end_ts",
      bucketSeconds = 60) // inverted year / 60s would be ~525k descending buckets
    assert(out.isEmpty)
  }
}
