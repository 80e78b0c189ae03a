package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.Profiler

class ProfilerSpec extends GraftSuite {
  import spark.implicits._

  private def df = Seq(
    (Some(1L), Some("a"), Some(1.5), Some(Timestamp.valueOf("2024-01-01 00:00:00"))),
    (Some(2L), None, Some(-0.5), None),
    (Some(2L), Some("b"), None, Some(Timestamp.valueOf("2024-01-02 00:00:00"))),
  ).toDF("k", "s", "v", "t")

  test("per-column nulls, distincts, and numeric bounds from one pass") {
    val out = Profiler.profile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("k").getLong(1) == 0L && out("k").getLong(2) == 2L)
    assert(out("k").getDouble(3) == 1.0 && out("k").getDouble(4) == 2.0)
    assert(out("s").getLong(1) == 1L && out("s").getLong(2) == 2L)
    assert(out("s").isNullAt(3) && out("s").isNullAt(4), "string columns have no numeric bounds")
    assert(out("v").getLong(1) == 1L && out("v").getDouble(3) == -0.5)
    // timestamps canonicalize to epoch micros
    assert(out("t").getDouble(3) == Timestamp.valueOf("2024-01-01 00:00:00").getTime * 1000.0)
  }

  test("row order follows the requested column order") {
    val names = Profiler.profile(df, cols = Seq("v", "k")).collect().map(_.getString(0))
    assert(names.toSeq == Seq("v", "k"))
  }

  test("approx mode bounds the distinct estimate within the configured rsd") {
    val big = spark.range(10000).select(col("id").cast("long").as("k"))
    val exact = 10000.0
    val est = Profiler.profile(big, approxRsd = Some(0.05))
      .collect().head.getLong(2).toDouble
    assert(math.abs(est - exact) / exact < 0.15, s"estimate $est too far from $exact")
  }

  test("a single aggregate job: the plan contains no join and one explode") {
    val plan = Profiler.profile(df).queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join"), s"profile must not join:\n$plan")
  }
}
