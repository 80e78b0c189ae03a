package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

class DedupSpec extends GraftSuite {
  import spark.implicits._

  private def incoming = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "b"))
    .toDF("id", "phone")
  private def existing = Seq("b", "z").toDF("phone")

  test("newRows keeps only unseen keys (left_anti)") {
    val ids = Dedup.newRows(incoming, existing, "phone")
      .select("id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 3L))
  }

  test("skippedRows reports rows whose key already exists") {
    val ids = Dedup.skippedRows(incoming, existing, "phone")
      .select("id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(2L, 4L))
  }

  test("exactByFingerprint keeps min id and counts the group") {
    val df = Seq((10L, "x"), (11L, "x"), (12L, "y")).toDF("id", "fp")
    val out = Dedup.exactByFingerprint(df, "fp", "id")
      .orderBy("fp").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq(("x", 10L, 2L), ("y", 12L, 1L)))
  }

  test("exactRows returns whole surviving rows only") {
    val df = Seq((10L, "x", "p"), (11L, "x", "q"), (12L, "y", "r")).toDF("id", "fp", "payload")
    val out = Dedup.exactRows(df, "fp", "id").orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(10L, 12L))
    assert(out.map(_.getString(2)).toSeq == Seq("p", "r"))
  }

  test("anti-join plan is a real join, not a collected list") {
    val plan = Dedup.newRows(incoming, existing, "phone")
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), s"expected LeftAnti join in:\n$plan")
  }
}
