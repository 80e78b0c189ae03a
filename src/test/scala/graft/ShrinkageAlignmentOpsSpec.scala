package graft

/** q_james_stein, q_dtw, q_word_analogy: driver-side replays of the
  * round-10 shrinkage / elastic-alignment / embedding-algebra surface.
  * The DTW replay is the textbook O(n·m) DP — checking the operator
  * (and its anti-diagonal recursive-CTE oracle) against the
  * definitional recurrence. */
class ShrinkageAlignmentOpsSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"
  private def q(key: String) = SparkEntry.queries(key)(spark, dir)

  test("James-Stein shrinkage replays; shrunk means pull toward grand") {
    val rows = spark.sql(s"""
      SELECT CAST(c.c_nationkey AS LONG),
             CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS LONG)
      FROM parquet.`$dir/orders.parquet` o
      JOIN parquet.`$dir/customer.parquet` c ON o.o_custkey = c.c_custkey""")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val per = rows.groupBy(_._1).toSeq.map { case (g, xs) =>
      val n = BigInt(xs.length)
      val sx = xs.map(x => BigInt(x._2)).sum
      val sxd = xs.map(x => BigInt(x._2 / 100)).sum
      val sxxd = xs.map(x => BigInt(x._2 / 100) * (x._2 / 100)).sum
      (g, n, sx, sx / n, sxd / n, (n * sxxd - sxd * sxd) / n)
    }
    val k = BigInt(per.length)
    val nn = per.map(_._2).sum
    val gmu = per.map(_._3).sum / nn
    val wvar = per.map(_._6).sum
    val smu = per.map(_._5).sum
    val smu2 = per.map(p => p._5 * p._5).sum
    val ssb = (k * smu2 - smu * smu) / k
    val s2n = (wvar / (nn - k)) * k / nn
    val cPpm = (BigInt(1000000) - ((k - 3) * s2n * 1000000) / ssb.max(1))
      .max(0)
    val want = per.map { case (g, n, _, mu, _, _) =>
      (g, n.toLong, mu.toLong, cPpm.toLong,
        (gmu + (mu - gmu) * cPpm / 1000000).toLong)
    }.toSet
    val got = q("q_james_stein").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == want)
    // shrinkage bites: 0 < c < 1 and every shrunk mean sits between
    // its raw mean and the grand mean
    val c = got.head._4
    assert(c > 0L && c < 1000000L, s"degenerate factor $c ppm")
    for (r <- got) {
      val (lo, hi) = (math.min(r._3, gmu.toLong), math.max(r._3, gmu.toLong))
      assert(r._5 >= lo - 1 && r._5 <= hi + 1,
        s"shrunk ${r._5} outside [$lo, $hi]")
    }
  }

  test("DTW cost replays the definitional DP; elastic beats rigid") {
    def series(ty: String): Array[Long] = {
      val d = eventsTable(dir).filter(s"event_type = '$ty'")
        .selectExpr("CAST(ts AS DATE) AS d").collect()
        .map(_.getDate(0).toString)
        .groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
        .toSeq.sortBy(_._1).map(_._2).toArray
      val tot = d.sum
      d.map(c => c * 1000000L / tot)
    }
    val a = series("purchase"); val b = series("click")
    val INF = Long.MaxValue / 4
    val dp = Array.fill(a.length + 1, b.length + 1)(INF)
    dp(0)(0) = 0L
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.abs(a(i - 1) - b(j - 1)) +
        math.min(dp(i - 1)(j - 1), math.min(dp(i - 1)(j), dp(i)(j - 1)))
    val rigid = a.zip(b).map(p => math.abs(p._1 - p._2)).sum
    val r = q("q_dtw").collect().head
    assert(r.getLong(0) == a.length.toLong && r.getLong(1) == b.length.toLong)
    assert(r.getLong(2) == dp(a.length)(b.length), "dtw_cost")
    assert(r.getLong(3) == rigid, "rigid_cost")
    // elastic alignment can only improve on the rigid pairing
    assert(r.getLong(2) <= r.getLong(3))
    assert(r.getLong(2) > 0L, "series identical — vacuous")
  }

  test("analogy targets compose exactly; best hits replay") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(f => math.floor(f.toDouble * 1e6).toLong).toArray))
    val byId = emb.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dp = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { dp += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      dp / math.sqrt(na * nb)
    }
    def q6(x: Double): Long =
      math.floor(BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble * 1e6 + 0.5).toLong
    val want = (0 until 8).map { i =>
      val (a, b, c) = (i.toLong * 3, i.toLong * 3 + 1, i.toLong * 3 + 2)
      val target = (0 until 64)
        .map(d => (byId(b)(d) - byId(a)(d) + byId(c)(d)).toDouble / 1e6).toArray
      val best = emb.filter(e => e._1 != a && e._1 != b && e._1 != c)
        .map(e => (e._1, q6(cos(e._2.map(_.toDouble / 1e6), target))))
        .minBy(p => (-p._2, p._1))
      (a, b, c, best._1, best._2)
    }.toSet
    val got = q("q_word_analogy").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == want)
    assert(got.exists(_._5 > 0L), "no analogy closed — vacuous probes")
  }
}
