package graft

import org.apache.spark.sql.functions._

/** q_cumulative_distinct, q_rolling_active on the sf0.001 fixtures. */
class ActiveUsersSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"
  private def q(key: String) = SparkEntry.queries(key)(spark, dir)

  private def events = {
    eventsTable(dir)
  }

  test("cumulative distinct ends at the total distinct-user count") {
    val rows = q("q_cumulative_distinct").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val total = events.select("user_id").distinct().count()
    assert(rows.last._3 == total, "final cumulative must equal distinct-ever")
    assert(rows.map(_._2).sum == total, "daily new users partition the user set")
    rows.sliding(2).filter(_.length == 2).foreach { case Array(a, b) =>
      assert(b._3 == a._3 + b._2, "cumulative increments by the day's new users")
    }
  }

  test("rolling WAU equals a driver-side trailing-7-day distinct") {
    val ud = events.select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val dmax = ud.map(_._2).max
    val got = q("q_rolling_active").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    got.foreach { case (dayStr, (dau, wau)) =>
      val day = java.time.LocalDate.parse(dayStr)
      val dauExp = ud.count(_._2 == day).toLong
      val wauExp = ud.filter { case (_, d) =>
        !d.isAfter(day) && !d.isBefore(day.minusDays(6))
      }.map(_._1).distinct.length.toLong
      assert(dau == dauExp, s"$dayStr dau $dau != $dauExp")
      assert(wau == wauExp, s"$dayStr wau $wau != $wauExp")
      assert(wau >= dau, "a week's actives can never undercut the day's")
      assert(!day.isAfter(dmax), "no day past the observed span")
    }
    assert(got.nonEmpty)
  }
}
