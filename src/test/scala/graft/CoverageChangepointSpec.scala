package graft

import org.apache.spark.sql.functions._

/** q_interval_coverage, q_changepoint: driver-side recomputation on the
  * sf0.001 fixtures plus the window-boundedness plan checks.
  */
class CoverageChangepointSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"
  private def q(key: String) = SparkEntry.queries(key)(spark, dir)

  private def events = {
    eventsTable(dir)
  }

  test("interval coverage equals a driver-side sweep merge") {
    val iv = events.select(col("user_id"), unix_micros(col("ts")).as("s"),
        col("value").cast("decimal(18,2)").as("v"))
      .collect().map { r =>
        val s = r.getLong(1)
        (r.getLong(0), s, s + (r.getDecimal(2).multiply(new java.math.BigDecimal(60000000))).longValue)
      }
    val expected = iv.groupBy(_._1).view.mapValues { g =>
      val sorted = g.map(t => (t._2, t._3)).sortBy(identity)
      var islands = 0L; var covered = 0L
      var curS = Long.MinValue; var curE = Long.MinValue
      sorted.foreach { case (s, e) =>
        if (islands == 0 || s > curE) {
          if (islands > 0) covered += curE - curS
          islands += 1; curS = s; curE = e
        } else if (e > curE) curE = e
      }
      if (islands > 0) covered += curE - curS
      (islands, covered)
    }.toMap
    val got = q("q_interval_coverage").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected, s"coverage diverges for ${got.keySet.find(k => got(k) != expected(k))}")
  }

  test("interval windows partition by user (never global)") {
    val plan = q("q_interval_coverage").queryExecution.executedPlan.toString
    val winLines = plan.linesIterator.filter(_.contains("Window")).mkString("\n")
    assert(winLines.nonEmpty && !winLines.contains("partitionBy=[]"),
      s"island merge must be user-bounded:\n$winLines")
  }

  test("linear fit matches a driver-side OLS on the zero-filled grid") {
    val hourly = events
      .groupBy(col("event_type"), expr("unix_micros(ts) div 3600000000").as("hr"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = hourly.groupBy(_._1).view.mapValues { g =>
      val h = g.map(x => x._2 -> x._3).toMap
      val series = (h.keys.min to h.keys.max).map(h.getOrElse(_, 0L))
      val n = series.length.toDouble
      val ts = series.indices.map(_.toLong)
      val (st, stt) = (ts.sum, ts.map(t => t * t).sum)
      val (sy, sty) = (series.sum, ts.zip(series).map(p => p._1 * p._2).sum)
      val cov = n * sty - st.toDouble * sy.toDouble
      val vt = n * stt - st.toDouble * st.toDouble
      def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (r6(cov / vt), r6((sy - cov / vt * st) / n))
    }.toMap
    val got = q("q_linear_fit").collect()
      .map(r => r.getString(0) -> ((r.getDouble(2), r.getDouble(3)))).toMap
    assert(got == expected, s"OLS diverges: $got vs $expected")
  }

  test("CUSUM peak matches a driver-side integer recomputation") {
    val hourly = events
      .groupBy(col("event_type"), expr("unix_micros(ts) div 3600000000").as("hr"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = hourly.groupBy(_._1).view.mapValues { g =>
      val h = g.map(x => x._2 -> x._3).toMap
      val (h0, h1) = (h.keys.min, h.keys.max)
      val series = (h0 to h1).map(hr => hr -> h.getOrElse(hr, 0L))
      val n = series.length.toLong
      val tot = series.map(_._2).sum
      var pre = 0L
      val peaks = series.zipWithIndex.map { case ((hr, c), i) =>
        pre += c
        (hr, math.abs(n * pre - (i + 1).toLong * tot))
      }
      val best = peaks.maxBy { case (hr, a) => (a, -hr) }
      (n, best._1,
        BigDecimal(best._2.toDouble / (n.toDouble * tot.toDouble))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toMap
    val got = q("q_changepoint").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got == expected, s"changepoint diverges: $got vs $expected")
  }
}
