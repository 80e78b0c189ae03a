package graft

import graft.operators.Cdc

class CdcSpec extends GraftSuite {
  import spark.implicits._

  private def base = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("id", "bal")

  test("last change per key wins: upserts update, deletes remove, inserts appear") {
    val changes = Seq(
      (1L, "U", 11.0, 1L), // stale update...
      (1L, "U", 12.0, 2L), // ...overridden by the later one
      (2L, "U", 99.0, 1L), // update...
      (2L, "D", 0.0, 2L),  // ...then deleted: key 2 disappears
      (4L, "D", 0.0, 1L),  // delete...
      (4L, "U", 40.0, 2L), // ...then re-inserted: new key appears
    ).toDF("id", "op", "bal", "seq")
    val out = Cdc.apply(base, changes, "id", Seq("bal"), "op", Seq("seq"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.toSeq == Seq((1L, 12.0), (3L, 30.0), (4L, 40.0)))
  }

  test("a key with no change survives unchanged; null-key changes are ignored") {
    val changes = Seq(
      (Option.empty[Long], "U", 77.0, 1L),
    ).toDF("id", "op", "bal", "seq")
    val out = Cdc.apply(base, changes, "id", Seq("bal"), "op", Seq("seq"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.toSeq == Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)))
  }

  test("duplicate sequence numbers resolve deterministically (op+value tiebreak)") {
    val changes = Seq(
      (1L, "U", 5.0, 1L),
      (1L, "U", 7.0, 1L), // same seq: max (op, values) struct wins → 7.0
    ).toDF("id", "op", "bal", "seq")
    val expect = (1L, 7.0)
    (1 to 3).foreach { _ =>
      val out = Cdc.apply(base, changes.repartition(7), "id", Seq("bal"), "op", Seq("seq"))
        .filter($"id" === 1L).collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(out.toSeq == Seq(expect))
    }
  }

  test("a NULL op marker upserts (anything other than deleteOp), never deletes") {
    val changes = Seq(
      (1L, Option.empty[String], 55.0, 1L),
    ).toDF("id", "op", "bal", "seq")
    val out = Cdc.apply(base, changes, "id", Seq("bal"), "op", Seq("seq"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.toSeq == Seq((1L, 55.0), (2L, 20.0), (3L, 30.0)),
      "NULL op must not silently delete the key")
  }

  test("delete-as-last on a missing key emits nothing (no phantom row)") {
    val changes = Seq((9L, "D", 0.0, 1L)).toDF("id", "op", "bal", "seq")
    val out = Cdc.apply(base, changes, "id", Seq("bal"), "op", Seq("seq"))
    assert(out.filter($"id" === 9L).isEmpty)
    assert(out.count() == 3L)
  }

  test("the feed collapses with one aggregate — no window in the plan") {
    val changes = Seq((1L, "U", 1.0, 1L)).toDF("id", "op", "bal", "seq")
    val plan = Cdc.apply(base, changes, "id", Seq("bal"), "op", Seq("seq"))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Window"), s"CDC collapse must not use a window:\n$plan")
  }
}
