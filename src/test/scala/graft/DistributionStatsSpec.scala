package graft

import org.apache.spark.sql.functions._
import graft.operators.PrefixSum

/** q_chisq_test, q_equidepth_hist, q_autocorr and the global-rank scan
  * they build on: driver-side recomputation on the sf0.001 fixtures plus
  * the plan shapes that keep each scale-safe (fixed-point folds, no
  * single-reducer window, broadcast-only stats rows).
  */
class DistributionStatsSpec extends GraftSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def q(key: String) = SparkEntry.queries(key)(spark, dir)

  private def events = {
    eventsTable(dir)
  }

  // ------------------------------------------------------- global rank scan

  test("withGlobalRank assigns exactly 1..n in composite order, any partitioning") {
    val df = Seq((5L, "a"), (1L, "b"), (5L, "b"), (2L, "a"), (1L, "a"))
      .toDF("v", "k").repartition(7)
    val got = PrefixSum.withGlobalRank(df, Seq("v", "k"), "r").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.map(_._3).sorted.toSeq == (1L to 5L),
      s"ranks must be dense 1..n: ${got.mkString(",")}")
    val inOrder = got.sortBy(_._3).map(t => (t._1, t._2)).toSeq
    assert(inOrder == Seq((1L, "a"), (1L, "b"), (2L, "a"), (5L, "a"), (5L, "b")),
      s"rank order must be the (v, k) sort order: $inOrder")
  }

  test("withGlobalRank plans no Window operator (two-phase scan only)") {
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val plan = PrefixSum.withGlobalRank(orders, Seq("o_totalprice", "o_orderkey"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"global rank must never be a row_number window:\n$plan")
  }

  // ------------------------------------------------------------ chi-square

  test("chi-square statistic matches a driver-side fixed-point recomputation") {
    val evs = events.select("event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val cut = (evs.map(_._1).min + evs.map(_._1).max) / 2
    val byType = evs.groupBy(_._2).view.mapValues { rs =>
      val o0 = rs.count(_._1 <= cut).toLong; (o0, rs.length - o0)
    }.toMap
    val n0 = byType.values.map(_._1).sum
    val n1 = byType.values.map(_._2).sum
    val sc = byType.values.map { case (o0, o1) =>
      val e0 = (o0 + o1).toDouble * n0.toDouble / (n0 + n1).toDouble
      val e1 = (o0 + o1).toDouble * n1.toDouble / (n0 + n1).toDouble
      math.floor(1e9 * ((o0 - e0) * (o0 - e0) / e0 + (o1 - e1) * (o1 - e1) / e1)).toLong
    }.sum
    val expected = BigDecimal(sc.toDouble / 1e9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val r = q("q_chisq_test").head()
    assert((r.getLong(0), r.getLong(1)) == ((n0, n1)))
    assert(r.getLong(2) == byType.size - 1, "dof = types - 1")
    assert(r.getDouble(3) == expected, s"chi2 ${r.getDouble(3)} != $expected")
  }

  test("chi-square joins are broadcast-only (stats rows never shuffle the scan)") {
    val plan = q("q_chisq_test").queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"1-row stats must broadcast:\n$plan")
    assert(!plan.contains("Window"), s"no window in the chi-square fold:\n$plan")
  }

  // ------------------------------------------------- equi-depth histogram

  test("equi-depth buckets partition all rows with near-equal depth") {
    val out = q("q_equidepth_hist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    val n = spark.read.parquet(s"$dir/orders.parquet").count()
    assert(out.map(_._1).toSeq == (0L until 8L), s"buckets must be 0..7: $out")
    assert(out.map(_._2).sum == n, "buckets must partition the table")
    val (fl, ce) = (n / 8, (n + 7) / 8)
    out.foreach { case (b, cnt, lo, hi) =>
      assert(cnt == fl || cnt == ce, s"bucket $b depth $cnt not in {$fl,$ce}")
      assert(lo <= hi, s"bucket $b range inverted")
    }
    // value ranges are ordered bucket over bucket (ties may touch)
    out.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 <= b._3, s"bucket ${a._1} hi ${a._4} > bucket ${b._1} lo ${b._3}")
    }
  }

  // --------------------------------------------------------- autocorrelation

  test("lag-1 autocorrelation matches a driver-side zero-filled recomputation") {
    val hourly = events
      .groupBy(col("event_type"), expr("unix_micros(ts) div 3600000000").as("hr"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val types = hourly.map(_._1).distinct
    val expected = types.flatMap { t =>
      val h = hourly.filter(_._1 == t).map(x => x._2 -> x._3).toMap
      val (h0, h1) = (h.keys.min, h.keys.max)
      val series = (h0 to h1).map(h.getOrElse(_, 0L))
      val pairs = series.dropRight(1).zip(series.drop(1))
      val np = pairs.length.toLong
      val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
      val sxy = pairs.map(p => p._1 * p._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      val vx = np.toDouble * sxx - sx.toDouble * sx.toDouble
      val vy = np.toDouble * syy - sy.toDouble * sy.toDouble
      if (vx > 0 && vy > 0)
        Some((t, BigDecimal((np.toDouble * sxy - sx.toDouble * sy.toDouble) / math.sqrt(vx * vy))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      else None
    }.toMap
    val got = q("q_autocorr").filter(col("lag") === 1).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(got == expected, s"lag-1 acf: $got != $expected")
  }

  test("autocorrelation is window-free and bounded to [-1, 1]") {
    val df = q("q_autocorr")
    assert(!df.queryExecution.executedPlan.toString.contains("Window"),
      "lagged pairing must be the equi-join, not a window")
    val bad = df.filter(abs(col("acf")) > 1.0 + 1e-9).count()
    assert(bad == 0, "Pearson r must stay in [-1, 1]")
  }

  // ----------------------------------------------------------------- ecdf

  test("ecdf is a valid tie-exact CDF: monotone, (0,1], top value at 1") {
    val out = q("q_ecdf").collect()
      .map(r => (r.getDouble(1), r.getDouble(2)))
    assert(out.forall { case (_, e) => e > 0.0 && e <= 1.0 })
    assert(out.maxBy(_._1)._2 == 1.0, "the maximum value must map to 1")
    val sorted = out.sortBy(_._1)
    sorted.sliding(2).foreach { case Array((v1, e1), (v2, e2)) =>
      assert(e1 <= e2, s"ECDF must be monotone: ($v1,$e1) then ($v2,$e2)")
      if (v1 == v2) assert(e1 == e2, "equal values must share their ecdf")
    }
  }

  test("ecdf ranks come from the two-phase scan, not a global window") {
    val plan = q("q_ecdf").queryExecution.executedPlan.toString
    val winLines = plan.linesIterator.filter(_.contains("Window")).mkString("\n")
    // the only window partitions by value (tie groups) — never empty
    assert(!winLines.contains("partitionBy=[]"),
      s"no unpartitioned window allowed:\n$winLines")
  }

  // -------------------------------------------------------- grouping sets

  test("grouping sets emits exactly the requested cells with consistent totals") {
    val rows = q("q_grouping_sets").collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)), r.getLong(2), r.getLong(4)))
    val byGid = rows.groupBy(_._4)
    assert(byGid.keySet == Set(0L, 1L, 3L), s"cells: ${byGid.keySet}")
    val n = spark.read.parquet(s"$dir/orders.parquet").count()
    assert(byGid(3L).map(_._3).sum == n, "grand total row covers the table")
    assert(byGid(1L).map(_._3).sum == n, "per-status subtotals cover the table")
    assert(byGid(0L).map(_._3).sum == n, "finest cells cover the table")
  }
}
