package graft

import graft.operators.Upsert

class UpsertSpec extends GraftSuite {
  import spark.implicits._

  private def base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
    .toDF("id", "name", "bal")

  test("update: matched rows take update values, unmatched updates dropped") {
    val updates = Seq((2L, 99.0), (7L, 77.0)).toDF("id", "bal")
    val out = Upsert.update(base, updates, "id", Seq("bal"))
      .orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(out.map(_.getDouble(2)).toSeq == Seq(10.0, 99.0, 30.0))
    assert(out.map(_.getString(1)).toSeq == Seq("a", "b", "c"))
  }

  test("update: orderCol ties break deterministically; null-ordered updates never win") {
    // two updates to id=2 with the SAME ts: the max value tuple wins —
    // deterministic however the shuffle lands
    val tied = Seq((2L, 50.0, "t1"), (2L, 99.0, "t1")).toDF("id", "bal", "ts")
    val out1 = Upsert.update(base, tied, "id", Seq("bal"), orderCol = Some("ts"))
      .filter($"id" === 2L).collect()
    assert(out1.head.getDouble(2) == 99.0)
    // updates whose orderCol is entirely NULL are ignored (an update
    // without an order value never overwrites base)
    val nullOrd = Seq((2L, 77.0, null: String)).toDF("id", "bal", "ts")
    val out2 = Upsert.update(base, nullOrd, "id", Seq("bal"), orderCol = Some("ts"))
      .filter($"id" === 2L).collect()
    assert(out2.head.getDouble(2) == 20.0)
    // and in merge: a NEW key whose only update is null-ordered must not
    // append a phantom all-null row
    val newKeyNullOrd = Seq((9L, "z", 77.0, null: String)).toDF("id", "name", "bal", "ts")
    val merged = Upsert.merge(base, newKeyNullOrd, "id", orderCol = Some("ts"))
    assert(merged.count() == 3)
    assert(merged.filter($"id" === 9L).count() == 0)
  }

  test("scd2Apply closes the current row and appends a new current row") {
    val history = Seq(
      (1L, 10.0, "2020-01-01", null: String),   // current, will be updated
      (1L, 5.0, "2019-01-01", "2020-01-01"),     // closed history, untouched
      (2L, 20.0, "2020-01-01", null: String),    // current, no update
    ).toDF("id", "bal", "valid_from", "valid_to")
    val updates = Seq((1L, 99.0, "2024-06-01")).toDF("id", "bal", "ts")
    val out = Upsert.scd2Apply(history, updates, "id", "bal", "ts")
      .orderBy("id", "valid_from").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, 5.0, "2019-01-01", "2020-01-01"),
      (1L, 10.0, "2020-01-01", "2024-06-01"),  // closed by the update
      (1L, 99.0, "2024-06-01", null),          // new current
      (2L, 20.0, "2020-01-01", null),          // untouched
    ))
  }

  test("scd2Apply with several updates for one key applies only the latest (no fan-out)") {
    val history = Seq((1L, 10.0, "2020-01-01", null: String))
      .toDF("id", "bal", "valid_from", "valid_to")
    val updates = Seq((1L, 50.0, "2024-01-01"), (1L, 99.0, "2024-06-01"))
      .toDF("id", "bal", "ts")
    val out = Upsert.scd2Apply(history, updates, "id", "bal", "ts")
      .orderBy("valid_from").collect()
      .map(r => (r.getDouble(1), r.getString(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (10.0, "2020-01-01", "2024-06-01"), // closed once, by the LATEST ts
      (99.0, "2024-06-01", null),         // one new current row
    ))
  }

  test("update: duplicate keys in the batch collapse (no base fan-out), last write wins") {
    val updates = Seq((2L, 50.0, 1L), (2L, 99.0, 2L), (2L, 60.0, 0L)).toDF("id", "bal", "seq")
    val out = Upsert.update(base, updates, "id", Seq("bal"), orderCol = Some("seq"))
      .orderBy("id").collect()
    assert(out.length == 3, "duplicate-key updates must not duplicate base rows")
    assert(out.map(_.getDouble(2)).toSeq == Seq(10.0, 99.0, 30.0))
  }

  test("merge: duplicate keys in the batch collapse (no base fan-out), last write wins") {
    val updates = Seq((2L, "B1", 50.0, 1L), (2L, "B2", 99.0, 2L), (9L, "z", 9.0, 1L))
      .toDF("id", "name", "bal", "seq")
    val out = Upsert.merge(base, updates, "id", orderCol = Some("seq"))
      .orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 9L))
    assert(out.map(r => (r.getString(1), r.getDouble(2))).toSeq ==
      Seq(("a", 10.0), ("B2", 99.0), ("c", 30.0), ("z", 9.0)))
  }

  test("merge: matched rows updated, unmatched updates appended") {
    val updates = Seq((2L, "B", 99.0), (7L, "g", 77.0)).toDF("id", "name", "bal")
    val out = Upsert.merge(base, updates, "id").orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 7L))
    assert(out.map(_.getDouble(2)).toSeq == Seq(10.0, 99.0, 30.0, 77.0))
    assert(out.map(_.getString(1)).toSeq == Seq("a", "B", "c", "g"))
  }
}
