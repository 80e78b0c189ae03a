package graft

import org.apache.spark.sql.functions._

/** q_conversion_lag, q_completeness, q_pareto_share on the sf0.001
  * fixtures (plus a gapped copy proving the missing-day path fires). */
class CompletenessParetoSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"
  private def q(key: String) = SparkEntry.queries(key)(spark, dir)

  private def events = {
    eventsTable(dir)
  }

  test("conversion lags are within the 7-day window and shares sum to 1") {
    val rows = q("q_conversion_lag").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (lagH, n, share) =>
      assert(lagH >= 0 && lagH < 7 * 24, s"lag $lagH outside the lookback")
      assert(n >= 1 && share > 0.0)
    }
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-3, "shares sum to ~1")
    assert(rows.map(_._1).distinct.length == rows.length, "one row per bucket")
  }

  test("completeness matches a driver-side day-span replay") {
    val real = events.select(col("event_type"), to_date(col("ts")).as("day"))
      .distinct().collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate))
    // the operator's planted every-7th-day '__probe' series (r10
    // vacuity fix): gaps exist at every SF
    val lo = real.map(_._2).min
    val hi = real.map(_._2).max
    val obs = real ++ Iterator.iterate(lo)(_.plusDays(7))
      .takeWhile(!_.isAfter(hi)).map("__probe" -> _).toSeq
    val rows = q("q_completeness").collect()
    assert(rows.length == obs.map(_._1).distinct.length)
    rows.foreach { r =>
      val t = r.getString(0)
      val days = obs.filter(_._1 == t).map(_._2)
      val (d0, d1) = (days.min, days.max)
      val expected = d0.until(d1.plusDays(1), java.time.temporal.ChronoUnit.DAYS)
      assert(r.getString(1) == d0.toString && r.getString(2) == d1.toString)
      assert(r.getLong(3) == expected, s"$t days_expected")
      assert(r.getLong(4) == days.length, s"$t days_present")
      assert(r.getLong(5) == expected - days.length, s"$t days_missing")
      val missing = (0L until expected).map(d0.plusDays)
        .filterNot(days.contains).map(_.toString)
      assert(r.getString(6) == missing.take(10).mkString(","), s"$t sample")
    }
    // the gap detector fires on the planted probe series on the BASE
    // fixture too (the injected-gap test below covers real data holes)
    val probe = rows.find(_.getString(0) == "__probe").get
    assert(probe.getLong(5) > 0 && probe.getString(6).nonEmpty,
      "planted sparse series reported no missing days")
  }

  test("completeness flags injected gaps (non-vacuous missing-day path)") {
    val gapDir = java.nio.file.Files
      .createTempDirectory("graft_gap").toString
    // drop every view event on odd days-of-month → guaranteed holes
    events.filter(!(col("event_type") === "view" &&
        dayofmonth(col("ts")) % 2 === 1))
      .withColumn("ts", expr("unix_micros(ts) * 1000")) // back to nanos-as-long
      .write.parquet(s"$gapDir/events.parquet")
    val rows = SparkEntry.queries("q_completeness")(spark, gapDir).collect()
      .map(r => (r.getString(0), r.getLong(5), r.getString(6)))
    val view = rows.find(_._1 == "view").get
    assert(view._2 > 0, "odd-day holes must be reported")
    assert(view._3.nonEmpty && view._3.split(",").length <= 10,
      "bounded non-empty missing-day sample")
    assert(rows.filter(r => r._1 != "view" && r._1 != "__probe")
      .forall(_._2 == 0), "untouched types stay complete")
  }

  test("pareto top set is the minimal prefix covering 80% of revenue") {
    val row = q("q_pareto_share").collect() match { case Array(r) => r }
    val (n, tot, thr, topUsers, topShare, covered) = (row.getLong(0),
      row.getLong(1), row.getLong(2), row.getLong(3), row.getDouble(4),
      row.getLong(5))
    val perUser = events.filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(sum((col("value").cast("decimal(18,2)") * 100).cast("long")).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(n == perUser.length && tot == perUser.map(_._2).sum)
    assert(thr == (4 * tot + 4) / 5)
    val desc = perUser.sortBy(p => (-p._2, p._1)).map(_._2)
    val cums = desc.scanLeft(0L)(_ + _).tail
    val wantTop = cums.indexWhere(_ >= thr) + 1
    assert(topUsers == wantTop, s"top_users $topUsers != $wantTop")
    assert(covered == cums(wantTop - 1), "covered_cents is the crossing cum")
    assert(covered >= thr && (wantTop == 1 || cums(wantTop - 2) < thr),
      "minimal prefix")
    val wantShare = BigDecimal(topUsers.toDouble / n)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(topShare - wantShare) < 1e-9)
  }
}
