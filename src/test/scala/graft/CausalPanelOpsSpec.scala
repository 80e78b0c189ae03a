package graft

/** q_ipw_ate, q_caliper_match, q_fixed_effects, q_event_study:
  * driver-side replays of the round-10 causal-inference surface. The
  * caliper-match replay is the definitional scan over ALL controls
  * per treated unit — checking the operator's sort-merge
  * nearest-below/above construction against brute force. */
class CausalPanelOpsSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"
  private def q(key: String) = SparkEntry.queries(key)(spark, dir)

  private lazy val orders: Array[(Long, Long, Boolean, Long, Long, String)] =
    spark.sql(s"""
      SELECT o.o_orderkey,
             CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS LONG),
             substr(o.o_orderpriority, 1, 1) = '1',
             CAST(CAST(c.c_acctbal AS DECIMAL(18,2)) * 100 AS LONG),
             CAST(c.c_nationkey AS LONG), c.c_mktsegment
      FROM parquet.`$dir/orders.parquet` o
      JOIN parquet.`$dir/customer.parquet` c ON o.o_custkey = c.c_custkey""")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
        r.getLong(3), r.getLong(4), r.getString(5)))

  test("IPW ATE replays from per-stratum exact folds") {
    val strata = orders.groupBy(_._6).toSeq.map { case (_, xs) =>
      val n = xs.length.toLong
      val nt = xs.count(_._3).toLong
      val yt = xs.filter(_._3).map(x => BigInt(x._2)).sum
      val yc = xs.filter(!_._3).map(x => BigInt(x._2)).sum
      (n, nt, yt, yc, nt * 1000000L / n)
    }.filter(s => s._5 > 0 && s._5 < 1000000)
    val nTotal = strata.map(_._1).sum
    val s1 = strata.map(s => s._3 * 1000000 / s._5).sum
    val s0 = strata.map(s => s._4 * 1000000 / (1000000 - s._5)).sum
    val r = q("q_ipw_ate").collect().head
    assert(r.getLong(0) == nTotal && r.getLong(1) == strata.length.toLong)
    assert(r.getLong(2) == (s1 / nTotal).toLong, "mu1")
    assert(r.getLong(3) == (s0 / nTotal).toLong, "mu0")
    assert(r.getLong(4) == (s1 / nTotal - s0 / nTotal).toLong, "ate")
  }

  test("caliper match equals the brute-force nearest-control scan") {
    val cal = 10000L
    val treated = orders.filter(_._3)
    val controls = orders.filter(!_._3)
    // representative control per distinct balance: min key
    val reps = controls.groupBy(_._4)
      .map { case (b, xs) => (b, xs.minBy(_._1)) }
    val cbals = controls.map(_._4).distinct
    var nm = 0L; var td = BigInt(0)
    for (t <- treated) {
      val below = cbals.filter(_ <= t._4).sorted.lastOption
      val above = cbals.filter(_ >= t._4).sorted.headOption
      val chosen = (below, above) match {
        case (Some(b), a) if t._4 - b <= cal
          && a.forall(x => t._4 - b <= x - t._4) => Some(b)
        case (_, Some(a)) if a - t._4 <= cal => Some(a)
        case (Some(b), _) if t._4 - b <= cal => Some(b)
        case _ => None
      }
      chosen.foreach { mb => nm += 1; td += BigInt(t._2) - reps(mb)._2 }
    }
    val r = q("q_caliper_match").collect().head
    assert(r.getLong(0) == treated.length.toLong, "n_treated")
    assert(r.getLong(1) == nm, "n_matched")
    val want = if (td >= 0) td / nm else -((-td) / nm)
    assert(r.getLong(2) == want.toLong, "att_cents")
    assert(nm > 0 && nm <= treated.length)
  }

  test("fixed-effects beta replays on the balanced grid; differs from OLS") {
    val daily = spark.sql(s"""
      SELECT CAST(c.c_nationkey AS LONG) AS g,
             date_format(o.o_orderdate, 'yyyy-MM-dd') AS d,
             sum(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS LONG)) AS y
      FROM parquet.`$dir/orders.parquet` o
      JOIN parquet.`$dir/customer.parquet` c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2""").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val days = daily.map(_._2).distinct.sorted
    val d0 = java.time.LocalDate.parse(days.head)
    val x = days.map(d => d -> java.time.temporal.ChronoUnit.DAYS
      .between(d0, java.time.LocalDate.parse(d))).toMap
    val groups = daily.map(_._1).distinct
    val cellY = daily.map(r => ((r._1, r._2), BigInt(r._3))).toMap
    def sdiv(a: BigInt, b: BigInt): BigInt =
      if (a >= 0) a * 1000000 / b else -((-a) * 1000000 / b)
    var num = BigInt(0); var den = BigInt(0)
    var (tn, tsx, tsxx, tsy, tsxy) =
      (BigInt(0), BigInt(0), BigInt(0), BigInt(0), BigInt(0))
    for (g <- groups) {
      val cells = days.map(d => (BigInt(x(d)), cellY.getOrElse((g, d), BigInt(0))))
      val nd = BigInt(cells.length)
      val sx = cells.map(_._1).sum; val sxx = cells.map(c => c._1 * c._1).sum
      val sy = cells.map(_._2).sum; val sxy = cells.map(c => c._1 * c._2).sum
      num += nd * sxy - sx * sy
      den += nd * sxx - sx * sx
      tn += nd; tsx += sx; tsxx += sxx; tsy += sy; tsxy += sxy
    }
    val r = q("q_fixed_effects").collect().head
    assert(r.getLong(0) == groups.length.toLong)
    assert(r.getLong(1) == days.length.toLong)
    assert(r.getLong(2) == sdiv(num, den).toLong, "beta_fe_ppm")
    assert(r.getLong(3) ==
      sdiv(tn * tsxy - tsx * tsy, tn * tsxx - tsx * tsx).toLong, "beta_ols_ppm")
  }

  test("event-study curve replays; the r=0 anchor day spikes") {
    val ev = eventsTable(dir)
      .selectExpr("user_id", "CAST(ts AS DATE) AS d", "event_type")
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getString(2)))
    val anchor = ev.filter(_._3 == "purchase").groupBy(_._1)
      .map { case (u, xs) => (u, xs.map(_._2).min) }
    val n = anchor.size.toLong
    val want = ev.flatMap { e =>
      anchor.get(e._1).map(d0 =>
        java.time.temporal.ChronoUnit.DAYS.between(d0, e._2))
    }.filter(r => r >= -5 && r <= 5)
      .groupBy(identity).map { case (r, xs) =>
        (r, xs.length.toLong, xs.length.toLong * 1000000L / n)
      }.toSet
    val got = q("q_event_study").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    // r = 0 contains every anchor's own purchase: it must dominate r = -1
    val at = got.map(g => g._1 -> g._3).toMap
    assert(at.getOrElse(0L, 0L) > at.getOrElse(-1L, 0L),
      "anchor day does not spike — event alignment broken")
  }
}
