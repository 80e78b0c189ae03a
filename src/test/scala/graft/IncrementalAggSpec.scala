package graft

import org.apache.spark.sql.functions._
import graft.operators.IncrementalAgg

class IncrementalAggSpec extends GraftSuite {
  import spark.implicits._

  private def batch(rows: (Long, Double)*) = rows.toSeq.toDF("k", "v")

  test("merged partial states equal the full recompute") {
    val b1 = batch((1L, 1.5), (1L, 2.5), (2L, 10.0))
    val b2 = batch((1L, 3.0), (3L, 7.25))
    val merged = IncrementalAgg.merge("k",
        IncrementalAgg.state(b1, "k", "v"), IncrementalAgg.state(b2, "k", "v"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2).doubleValue))
    val full = IncrementalAgg.state(b1.unionAll(b2), "k", "v")
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2).doubleValue))
    assert(merged.toSeq == full.toSeq)
    assert(merged.toSeq == Seq((1L, 3L, 7.0), (2L, 1L, 10.0), (3L, 1L, 7.25)))
  }

  test("merge is associative: ((a+b)+c) == (a+(b+c))") {
    val a = IncrementalAgg.state(batch((1L, 1.0)), "k", "v")
    val b = IncrementalAgg.state(batch((1L, 2.0), (2L, 5.0)), "k", "v")
    val c = IncrementalAgg.state(batch((2L, 0.5)), "k", "v")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("k").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDecimal(2).stripTrailingZeros)).toSeq
    assert(rows(IncrementalAgg.merge("k", IncrementalAgg.merge("k", a, b), c)) ==
      rows(IncrementalAgg.merge("k", a, IncrementalAgg.merge("k", b, c))))
  }

  test("a key absent from the delta keeps its history state exactly") {
    val hist = IncrementalAgg.state(batch((9L, 42.0)), "k", "v")
    val delta = IncrementalAgg.state(batch((1L, 1.0)), "k", "v")
    val out = IncrementalAgg.merge("k", hist, delta)
      .filter($"k" === 9L).collect().head
    assert(out.getLong(1) == 1L && out.getDecimal(2).doubleValue == 42.0)
  }

  test("state merge is one aggregate over a union — no join, no window") {
    val a = IncrementalAgg.state(batch((1L, 1.0)), "k", "v")
    val b = IncrementalAgg.state(batch((1L, 2.0)), "k", "v")
    val plan = IncrementalAgg.merge("k", a, b).queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Window"),
      s"state merge must stay a pure aggregate:\n$plan")
  }
}
