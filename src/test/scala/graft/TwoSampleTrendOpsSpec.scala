package graft

/** q_energy_distance, q_cochran_q, q_page_trend, q_fisher_ratio:
  * driver-side replays of the round-10 two-sample / trend / feature-
  * screen surface. Each test recomputes the statistic from raw fixture
  * rows with naive (brute-force or BigInt) arithmetic — the O(n²)
  * energy sums in particular check the operator's rank-fold identity
  * against the definitionally-correct all-pairs form. */
class TwoSampleTrendOpsSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"
  private def q(key: String) = SparkEntry.queries(key)(spark, dir)

  private lazy val orders: Array[(Long, Long, String, Int)] =
    spark.read.parquet(s"$dir/orders.parquet")
      .selectExpr("o_orderkey", "o_custkey", "o_orderstatus",
        "CAST(year(o_orderdate) AS INT) AS y",
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS LONG) AS cents")
      .collect()
      .map(r => (r.getLong(4), r.getLong(1), r.getString(2), r.getInt(3)))

  test("energy distance matches the brute-force all-pairs statistic") {
    val x = orders.filter(_._3 == "F").map(_._1)
    val y = orders.filter(_._3 == "O").map(_._1)
    def cross(a: Array[Long], b: Array[Long]): BigInt = {
      var s = BigInt(0)
      for (u <- a; v <- b) s += (u - v).abs
      s
    }
    def within(a: Array[Long]): BigInt = {
      var s = BigInt(0)
      for (i <- a.indices; j <- (i + 1) until a.length) s += (a(i) - a(j)).abs
      s
    }
    val m = BigInt(x.length); val n = BigInt(y.length)
    val exx = within(x) * 2000000 / (m * m)
    val eyy = within(y) * 2000000 / (n * n)
    val exy2 = cross(x, y) * 2000000 / (m * n)
    val r = q("q_energy_distance").collect().head
    assert(r.getLong(0) == x.length && r.getLong(1) == y.length)
    assert(r.getLong(2) == exx.toLong, "e_xx_micro")
    assert(r.getLong(3) == eyy.toLong, "e_yy_micro")
    assert(r.getLong(4) == exy2.toLong, "e_xy2_micro")
    assert(r.getLong(5) == (exy2 - exx - eyy).toLong, "energy_micro")
    // energy distance is non-negative (it's a metric between the laws)
    assert(r.getLong(5) >= 0L)
  }

  test("Cochran's Q replays from the per-customer binary triple") {
    val triples = orders
      .filter(o => o._4 >= 1995 && o._4 <= 1997)
      .groupBy(_._2)
      .map { case (_, os) =>
        val ys = os.map(o => o._4).toSet
        (if (ys(1995)) 1L else 0L, if (ys(1996)) 1L else 0L,
          if (ys(1997)) 1L else 0L)
      }.toArray
    val c1 = triples.map(_._1).sum
    val c2 = triples.map(_._2).sum
    val c3 = triples.map(_._3).sum
    val nTot = c1 + c2 + c3
    val sr2 = triples.map(t => { val r = t._1 + t._2 + t._3; r * r }).sum
    val num = (BigInt(3) * (BigInt(c1) * c1 + BigInt(c2) * c2 + BigInt(c3) * c3)
      - BigInt(nTot) * nTot) * 2 * 1000000
    val den = 3 * nTot - sr2
    val r = q("q_cochran_q").collect().head
    assert(r.getLong(0) == triples.length, "n_blocks")
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((c1, c2, c3)))
    assert(r.getLong(4) == 2L, "df")
    assert(den != 0, "fixture degenerate: all blocks uniform")
    assert(r.getLong(5) == (num / den).toLong, "q_micro")
    assert(r.getLong(5) >= 0L, "Q is a non-negative statistic")
  }

  test("Page's L replays with the deterministic year tiebreak") {
    val counts = orders
      .filter(o => o._4 >= 1995 && o._4 <= 1997)
      .map(o => (o._2, o._4))
    val custNation = spark.read.parquet(s"$dir/customer.parquet")
      .selectExpr("c_custkey", "CAST(c_nationkey AS LONG)").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val cellCnt = counts
      .map { case (ck, y) => (custNation(ck), y) }
      .groupBy(identity).map { case (k, v) => (k, v.length.toLong) }
    val nations = spark.read.parquet(s"$dir/nation.parquet")
      .selectExpr("CAST(n_nationkey AS LONG)").collect().map(_.getLong(0))
    var l = 0L
    for (nk <- nations) {
      val cells = Seq(1995, 1996, 1997)
        .map(y => (y, cellCnt.getOrElse((nk, y), 0L)))
      val ranked = cells.sortBy { case (y, c) => (c, y) }.zipWithIndex
      for (((y, _), i) <- ranked) l += (y - 1994).toLong * (i + 1)
    }
    val b = nations.length.toLong
    val r = q("q_page_trend").collect().head
    assert(r.getLong(0) == b, "n_blocks")
    assert(r.getLong(1) == l, "l_stat")
    assert(r.getLong(2) == java.lang.Long.signum(l - 12 * b).toLong)
    assert(r.getLong(3) == (BigInt(l - 12 * b).pow(2) * 1000000 / (2 * b)).toLong)
  }

  test("Fisher ratio replays per dim; top-10 ordering is (ratio, dim)") {
    val rows = spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("label", "embedding").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
      .filter(p => p._1 == 0 || p._1 == 1)
    val all = (0 until 64).map { d =>
      def grp(lbl: Int) = rows.filter(_._1 == lbl)
        .map(p => math.floor(p._2(d).toDouble * 1000).toLong)
      val (g0, g1) = (grp(0), grp(1))
      val (n0, n1) = (BigInt(g0.length), BigInt(g1.length))
      val (s0, s1) = (BigInt(g0.sum), BigInt(g1.sum))
      val q0 = g0.map(v => BigInt(v) * v).sum
      val q1 = g1.map(v => BigInt(v) * v).sum
      val num = (s0 * n1 - s1 * n0).pow(2) * 1000000
      val den = n1 * n1 * (n0 * q0 - s0 * s0) + n0 * n0 * (n1 * q1 - s1 * s1)
      (d.toLong, n0.toLong, n1.toLong,
        if (den == 0) None else Some((num / den).toLong))
    }
    val want = all.sortBy { case (d, _, _, f) => (-f.getOrElse(Long.MaxValue), d) }
      .take(10)
    val got = q("q_fisher_ratio").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    assert(got.length == 10)
    assert(got.toSeq == want.toSeq)
    // the screen must actually discriminate something: not all ratios 0
    assert(got.exists(_._4.exists(_ > 0L)), "all Fisher ratios zero — vacuous screen")
  }
}
