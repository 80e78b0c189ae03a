package graft

import java.sql.Timestamp

import graft.operators.AsofJoin

class AsofJoinSpec extends GraftSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("lastPriorMatch carries the most recent prior-or-equal right payload") {
    val left = Seq(
      (1L, 7L, ts("2024-01-01 10:00:00")),
      (2L, 7L, ts("2024-01-01 11:00:00")),
      (3L, 7L, ts("2024-01-01 09:00:00")), // before any right row
      (4L, 8L, ts("2024-01-01 10:30:00")),
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (7L, ts("2024-01-01 10:00:00"), 100L), // equal ts → inclusive match
      (7L, ts("2024-01-01 10:30:00"), 101L),
      (8L, ts("2024-01-01 10:00:00"), 200L),
    ).toDF("user_id", "ts", "payload")

    val out = AsofJoin.lastPriorMatch(left, right, "user_id", "ts", "ts",
      "payload", "asof_payload")
      .orderBy("event_id")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 100L), // inclusive: equal-ts right row matches
      (2L, 101L), // latest of the two prior rows
      (3L, -1L),  // nothing prior → null
      (4L, 200L), // keys don't bleed across users
    ))
  }

  test("NULL keys never match each other (join semantics, not window-group semantics)") {
    val left = Seq(
      (1L, Option.empty[Long], ts("2024-01-01 10:00:00")),
      (2L, Option(7L), ts("2024-01-01 10:00:00")),
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (Option.empty[Long], ts("2024-01-01 09:00:00"), 100L),
      (Option(7L), ts("2024-01-01 09:00:00"), 200L),
    ).toDF("user_id", "ts", "payload")
    val out = AsofJoin.lastPriorMatch(left, right, "user_id", "ts", "ts",
      "payload", "p").orderBy("event_id").collect()
    assert(out(0).isNullAt(3), "NULL-key left row must not take a NULL-key right payload")
    assert(out(1).getLong(3) == 200L)
  }

  test("a NULL payload on the most recent prior right row yields NULL, not an older payload") {
    val left = Seq(
      (1L, 7L, ts("2024-01-01 11:00:00")),
      (2L, 7L, ts("2024-01-01 09:30:00")),
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (7L, ts("2024-01-01 09:00:00"), Option(100L)),
      (7L, ts("2024-01-01 10:00:00"), Option.empty[Long]), // most recent prior for event 1
    ).toDF("user_id", "ts", "payload")
    val out = AsofJoin.lastPriorMatch(left, right, "user_id", "ts", "ts",
      "payload", "p").orderBy("event_id").collect()
    assert(out(0).isNullAt(3),
      "the NULL-payload right row is the as-of match — must not fall back to the older row")
    assert(out(1).getLong(3) == 100L)
  }

  test("a NULL right timestamp never matches (ASOF comparison semantics)") {
    val left = Seq((1L, 7L, ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (7L, Option.empty[Timestamp], 100L), // NULL ts: must not ride as a prior match
    ).toDF("user_id", "ts", "payload")
    val out = AsofJoin.lastPriorMatch(left, right, "user_id", "ts", "ts",
      "payload", "p").collect()
    assert(out.head.isNullAt(3), "NULL-ts right row must not match")
  }

  test("lastPriorMatchWithin expires matches older than the tolerance") {
    val left = Seq(
      (1L, 7L, ts("2024-01-01 10:00:00")), // match 30 min old → kept
      (2L, 7L, ts("2024-01-01 12:00:00")), // match 2.5 h old → expired
      (3L, 7L, ts("2024-01-01 09:00:00")), // nothing prior → null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq((7L, ts("2024-01-01 09:30:00"), 100L))
      .toDF("user_id", "ts", "payload")
    val out = AsofJoin.lastPriorMatchWithin(left, right, "user_id", "ts", "ts",
      "payload", "p", toleranceSeconds = 3600L)
      .orderBy("event_id").collect()
      .map(r => if (r.isNullAt(3)) -1L else r.getLong(3))
    assert(out.toSeq == Seq(100L, -1L, -1L))
  }

  test("plan is one shuffle + window, no range-join explosion") {
    val left = Seq((1L, 7L, ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq((7L, ts("2024-01-01 09:00:00"), 5L)).toDF("user_id", "ts", "payload")
    val plan = AsofJoin.lastPriorMatch(left, right, "user_id", "ts", "ts",
      "payload", "p").queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian") && !plan.toLowerCase.contains("broadcastnestedloop"),
      s"as-of must not be a range join:\n$plan")
    assert(plan.contains("Window"), s"expected a running-window plan:\n$plan")
  }
}
