package graft

import org.apache.spark.sql.functions._
import graft.operators.{Funnel, TimeSeries}

class EventAnalyticsSpec extends GraftSuite {
  import spark.implicits._

  // ---- Funnel --------------------------------------------------------------

  private def funnelEvents = Seq(
    // user 1: full A→B→C in order
    (1L, 100L, "A"), (1L, 200L, "B"), (1L, 300L, "C"),
    // user 2: B before A never counts; no B at-or-after A ⇒ depth 1
    (2L, 50L, "B"), (2L, 100L, "A"),
    // user 3: C before its B ⇒ B reached, C not (C must be >= first B)
    (3L, 100L, "A"), (3L, 150L, "C"), (3L, 200L, "B"),
    // user 4: never entered (no A)
    (4L, 100L, "B"), (4L, 200L, "C"),
    // user 5: simultaneous A and B at the same micros ⇒ >= admits B
    (5L, 100L, "A"), (5L, 100L, "B"),
  ).toDF("uid", "us", "kind")

  private def runFunnel = Funnel.firstCompletion(
    funnelEvents, "uid", col("us"),
    Seq("tA" -> (col("kind") === "A"),
      "tB" -> (col("kind") === "B"),
      "tC" -> (col("kind") === "C")))

  test("funnel: steps complete in order, at-or-after the prior step") {
    val rows = runFunnel.collect()
      .map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), r.getInt(4))))
      .toMap
    assert(rows(1L) == ((Some(100L), Some(200L), Some(300L), 3)))
    assert(rows(2L) == ((Some(100L), None, None, 1)))
    assert(rows(3L) == ((Some(100L), Some(200L), None, 2)))
    assert(!rows.contains(4L), "a user with no step-1 event never enters the funnel")
    assert(rows(5L) == ((Some(100L), Some(100L), None, 2)))
  }

  test("funnel: nulls only trail (depth is consistent with the step columns)") {
    runFunnel.collect().foreach { r =>
      val steps = Seq(Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))
      val depth = r.getInt(4)
      assert(steps.take(depth).forall(_.isDefined), s"hole inside depth: $r")
      assert(steps.drop(depth).forall(_.isEmpty), s"value past depth: $r")
    }
  }

  // ---- Retention -----------------------------------------------------------

  test("retention: offset-0 cell counts the whole cohort once") {
    val ev = eventsTable("/root/testdata/sf0.001")
    val out = TimeSeries.cohortRetention(ev, "user_id", to_date(col("ts")))
    val zero = out.filter(col("day_offset") === 0)
      .agg(sum("n_users")).first().getLong(0)
    val users = ev.select("user_id").distinct().count()
    assert(zero == users, s"offset-0 total $zero != distinct users $users")
    assert(out.filter(col("day_offset") < 0).isEmpty,
      "no activity can precede the cohort date")
  }

  // ---- Gap fill ------------------------------------------------------------

  test("gap fill: grid is dense per key and zero-fills empty buckets") {
    val df = Seq(
      (1L, 0L), (1L, 3_600_000_000L * 3), // hours 0 and 3 ⇒ grid 0..3
      (2L, 3_600_000_000L), // single event ⇒ one bucket
    ).toDF("k", "us")
    val out = TimeSeries.denseCounts(df, "k", col("us"), bucketUs = 3_600_000_000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set(
      (1L, 0L, 1L), (1L, 1L, 0L), (1L, 2L, 0L), (1L, 3L, 1L),
      (2L, 1L, 1L)))
  }

  test("gap fill: bucket math is exact long division (no double rounding)") {
    // 2^53 + 1 micros is not representable as a double; integer DIV keeps it
    val big = (1L << 53) + 1L
    val out = TimeSeries.denseCounts(Seq((1L, big)).toDF("k", "us"),
      "k", col("us"), bucketUs = 1L).collect()
    assert(out.head.getLong(1) == big)
  }
}
