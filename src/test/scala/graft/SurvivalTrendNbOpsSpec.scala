package graft

/** q_nelson_aalen, q_jonckheere, q_moran_i, q_naive_bayes: driver-side
  * replays of the round-10 survival / ordered-trend / graph-attribute /
  * classifier surface. The Jonckheere replay in particular is the
  * definitional O(n²) pair count — checking the operator's
  * distinct-domain prefix-scan fold against brute force. */
class SurvivalTrendNbOpsSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"
  private def q(key: String) = SparkEntry.queries(key)(spark, dir)

  test("Nelson-Aalen cumulative hazard replays; hazard dominates KM -ln S") {
    val ud = eventsTable(dir)
      .filter("event_type = 'purchase'")
      .selectExpr("user_id", "CAST(ts AS DATE) AS d").distinct()
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val life = ud.groupBy(_._1).toSeq.map { case (_, ds) =>
      val days = ds.map(_._2)
      (days.min, days.max)
    }.toArray
    val gmax = life.map(_._2).max
    val ten = life.map { case (d0, d1) =>
      (java.time.temporal.ChronoUnit.DAYS.between(d0, d1).toInt,
        if (d1.isBefore(gmax)) 1L else 0L)
    }.groupBy(_._1).map { case (t, xs) =>
      (t, xs.length.toLong, xs.map(_._2).sum)
    }.toArray.sortBy(_._1)
    var atRisk = ten.map(_._2).sum
    var cum = 0L; var cv = 0L
    val want = ten.map { case (t, nEnd, dChurn) =>
      val n = atRisk
      cum += dChurn * 1000000L / n
      cv += (BigInt(dChurn) * 1000000000L / (BigInt(n) * n)).toLong
      atRisk -= nEnd
      (t, n, dChurn, cum, cv)
    }.toSeq
    val got = q("q_nelson_aalen").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq.sortBy(_._1)
    assert(got == want)
    assert(got.last._4 > 0L, "no hazard accumulated — vacuous fixture")
  }

  test("Jonckheere J2 matches the brute-force ordered pair count") {
    val rows = spark.read.parquet(s"$dir/orders.parquet")
      .selectExpr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS LONG)",
        "CAST(substr(o_orderpriority, 1, 1) AS INT)")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    var j2 = BigInt(0)
    for (i <- 1 to 5; j <- (i + 1) to 5) {
      val a = rows.filter(_._2 == i).map(_._1)
      val b = rows.filter(_._2 == j).map(_._1)
      for (x <- a; y <- b) {
        if (x < y) j2 += 2 else if (x == y) j2 += 1
      }
    }
    val ns = (1 to 5).map(i => BigInt(rows.count(_._2 == i)))
    val nt = ns.sum
    val aA = nt * nt - ns.map(n => n * n).sum
    val bB = nt * nt * (2 * nt + 3) - ns.map(n => n * n * (2 * n + 3)).sum
    val dev = j2 * 2 - aA
    val r = q("q_jonckheere").collect().head
    assert(r.getLong(0) == nt.toLong, "n_total")
    assert(r.getLong(1) == j2.toLong, "j2")
    assert(r.getLong(2) == dev.signum.toLong, "trend_sign")
    assert(r.getLong(3) == (dev * dev * 9000000 / (2 * bB)).toLong, "z2_micro")
  }

  test("Moran's I replays from the brute-force edge fold; |I| sane") {
    // same co-purchase edge definition as the operator (>=2 co-orders)
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .selectExpr("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { ps =>
      val parts = ps.map(_._2).distinct.sorted
      for (i <- parts.indices; j <- (i + 1) until parts.length)
        yield (parts(i), parts(j))
    }.groupBy(identity).filter(_._2.size >= 2).keys.toArray
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val price = spark.read.parquet(s"$dir/part.parquet")
      .selectExpr("p_partkey",
        "CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS LONG)")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val n = BigInt(nodes.length)
    val sum = nodes.map(v => BigInt(price(v))).sum
    val z = nodes.map(v => (v, BigInt(price(v)) * n - sum)).toMap
    val szz = edges.map(e => z(e._1) * z(e._2)).sum
    val sz2 = nodes.map(v => z(v) * z(v)).sum
    val want = n * szz * 1000000 / (BigInt(edges.length) * sz2)
    val r = q("q_moran_i").collect().head
    assert(r.getLong(0) == nodes.length.toLong)
    assert(r.getLong(1) == edges.length.toLong)
    assert(r.getLong(2) == want.toLong, "moran_micro")
    // Moran's I is bounded by roughly [-1, 1] up to the n/(n-1) factor
    assert(math.abs(r.getLong(2)) < 2000000L)
  }

  test("Naive Bayes confusion matrix replays exactly and discriminates") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id", "lang", "trim(lower(text)) AS t").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split("\\s+").toSeq))
    val mod = BigInt("36028797018963913")
    def train(id: Long) =
      (BigInt(id) * BigInt("6364136223846793005") mod mod) % 4 < 3
    val tr = docs.filter(d => train(d._1))
    val te = docs.filter(d => !train(d._1))
    val cnt = tr.flatMap(d => d._3.map(t => (d._2, t)))
      .groupBy(identity).map { case (k, v) => (k, v.length.toLong) }
    val tot = cnt.groupBy(_._1._1).map { case (c, m) => (c, m.values.sum) }
    val v = cnt.keys.map(_._2).toSet.size.toLong
    val nd = tr.groupBy(_._2).map { case (c, ds) => (c, ds.length.toLong) }
    val ndt = nd.values.sum
    val classes = tot.keys.toSeq.sorted
    def lnQ6(x: BigInt): Long =
      math.floor(math.log(x.toDouble) * 1e6).toLong
    val scale = BigInt("1000000000000")
    val lnScale = 27631021L
    val want = te.map { case (_, lang, toks) =>
      val best = classes.map { c =>
        val prior = lnQ6(BigInt(nd(c)) * scale / ndt) - lnScale
        val s = toks.map { t =>
          val k = cnt.getOrElse((c, t), 0L) + 1
          lnQ6(BigInt(k) * scale / (tot(c) + v)) - lnScale
        }.sum + prior
        (-s, c)
      }.min._2
      (lang, best)
    }.groupBy(identity).map { case (k, xs) => (k._1, k._2, xs.length.toLong) }
      .toSet
    val got = q("q_naive_bayes").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want)
    // must not collapse to a single predicted class
    assert(got.map(_._2).size > 1, "classifier is constant — vacuous")
  }
}
