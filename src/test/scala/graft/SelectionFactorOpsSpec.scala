package graft

/** q_als_factor, q_greedy_cover, q_qte, q_rich_club: driver-side
  * replays of the round-10 factorization / coverage-selection /
  * distributional-effect / graph-topology surface. */
class SelectionFactorOpsSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"
  private def q(key: String) = SparkEntry.queries(key)(spark, dir)

  test("rank-1 ALS item factors replay the exact alternation") {
    val r = eventsTable(dir)
      .selectExpr("user_id", "event_type").collect()
      .map(x => (x.getLong(0), x.getString(1)))
      .groupBy(identity).map { case (k, v) => (k._1, k._2, v.size.toLong) }
      .toSeq
    var v = r.map(_._2).distinct.map(t => t -> BigInt(1000000)).toMap
    var u = Map.empty[Long, BigInt]
    for (_ <- 1 to 2) {
      u = r.groupBy(_._1).map { case (uid, xs) =>
        val num = xs.map(x => BigInt(x._3) * v(x._2)).sum * 1000000
        val den = (xs.map(x => v(x._2) * v(x._2)).sum / 1000000).max(1)
        uid -> num / den
      }
      v = r.groupBy(_._2).map { case (t, xs) =>
        val num = xs.map(x => BigInt(x._3) * u(x._1)).sum * 1000000
        val den = (xs.map(x => u(x._1) * u(x._1)).sum / 1000000).max(1)
        t -> num / den
      }
    }
    val mass = r.groupBy(_._2).map { case (t, xs) => t -> xs.map(_._3).sum }
    val want = v.map { case (t, f) => (t, mass(t), f.toLong) }.toSet
    val got = q("q_als_factor").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toSet
    assert(got == want)
    // factors must differentiate the types (not stuck at the init)
    assert(got.map(_._3).size > 1, "all item factors equal — vacuous")
  }

  test("greedy cover picks argmax marginal gains with exact totals") {
    val srcSh = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("source", "trim(lower(text)) AS t").collect()
      .flatMap { x =>
        val toks = x.getString(1).split("\\s+")
        val sh = if (toks.length < 3) Seq(toks.mkString(" "))
          else toks.sliding(3).map(_.mkString(" ")).toSeq
        sh.map(s => (x.getString(0), s))
      }.distinct
    val bySrc = srcSh.groupBy(_._1).map { case (s, xs) => (s, xs.map(_._2).toSet) }
    var covered = Set.empty[String]
    var chosen = Vector.empty[(Int, String, Long, Long)]
    for (round <- 1 to 4) {
      val (src, gain) = bySrc.view
        .filterKeys(k => !chosen.exists(_._2 == k))
        .map { case (s, sh) => (s, (sh -- covered).size.toLong) }
        .toSeq.minBy { case (s, g) => (-g, s) }
      val total = chosen.lastOption.fold(0L)(_._4) + gain
      chosen = chosen :+ ((round, src, gain, total))
      covered = covered ++ bySrc(src)
    }
    val got = q("q_greedy_cover").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toVector
    assert(got == chosen)
    // submodularity: marginal gains are non-increasing
    val gains = got.map(_._3)
    assert(gains.zip(gains.tail).forall { case (a, b) => b <= a },
      s"gains increased: $gains")
  }

  test("QTE quantiles replay by exact rank selection") {
    val rows = spark.read.parquet(s"$dir/orders.parquet")
      .selectExpr("o_orderkey",
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS LONG) AS cents",
        "CAST(substr(o_orderpriority, 1, 1) AS INT) AS g")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .filter(r => r._3 == 1 || r._3 == 5)
    def quant(g: Int): Map[Int, Long] = {
      val sorted = rows.filter(_._3 == g).sortBy(r => (r._2, r._1))
      Seq(10, 25, 50, 75, 90).map { p =>
        p -> sorted(((p * sorted.length + 99) / 100 - 1).toInt)._2
      }.toMap
    }
    val (t, c) = (quant(1), quant(5))
    val got = q("q_qte").collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == 5)
    for (r <- got) {
      assert(r._2 == t(r._1) && r._3 == c(r._1))
      assert(r._4 == r._2 - r._3)
    }
  }

  test("rich-club coefficients replay; phi grows or holds with k") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .selectExpr("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { ps =>
      val parts = ps.map(_._2).distinct.sorted
      for (i <- parts.indices; j <- (i + 1) until parts.length)
        yield (parts(i), parts(j))
    }.groupBy(identity).filter(_._2.size >= 2).keys.toArray
    val deg = edges.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (v, xs) => (v, xs.length.toLong) }
    val want = Seq(1L, 2L, 4L, 8L, 16L).flatMap { k =>
      val nk = deg.count(_._2 > k).toLong
      if (nk < 2) None
      else {
        val ek = edges.count(e => deg(e._1) > k && deg(e._2) > k).toLong
        Some((k, nk, ek, ek * 2 * 1000000L / (nk * (nk - 1))))
      }
    }.toSet
    val got = q("q_rich_club").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want)
    assert(got.nonEmpty && got.exists(_._4 > 0L))
  }
}
