package graft

/** q_mmr, q_croston, q_js_divergence: driver-side replays of the
  * round-10 diversity-reranking / intermittent-forecast / mixture-
  * divergence surface. */
class RerankForecastDivergenceOpsSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"
  private def q(key: String) = SparkEntry.queries(key)(spark, dir)

  test("MMR greedy selection replays; picks diversify vs pure top-k") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    val qsum = Array.fill(64)(0L); var nq = 0L
    for ((_, v, l) <- emb if l == 0) {
      nq += 1
      for (d <- 0 until 64)
        qsum(d) += math.floor(v(d).toDouble * 1000000).toLong
    }
    val qv = qsum.map(s => (s / nq).toDouble / 1e6)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dp = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { dp += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      dp / math.sqrt(na * nb)
    }
    def q6(x: Double): Long =
      math.floor(BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble * 1e6 + 0.5).toLong
    val vecs = emb.map(e => (e._1, e._2.map(_.toDouble)))
    val rel = vecs.map { case (id, v) => (id, q6(cos(v, qv)), v) }
    var sel = Vector.empty[(Long, Long, Long, Array[Double])]
    for (_ <- 1 to 5) {
      val cands = rel.filter(r => !sel.exists(_._1 == r._1)).map { case (id, rq, v) =>
        val ms = if (sel.isEmpty) 0L else sel.map(s => q6(cos(v, s._4))).max
        val raw = 7 * rq - 3 * ms
        val score = if (raw >= 0) raw / 10 else -((-raw) / 10)
        (id, rq, score, v)
      }
      sel = sel :+ cands.minBy(c => (-c._3, c._1))
    }
    val want = sel.zipWithIndex
      .map { case ((id, rq, sc, _), i) => (i + 1L, id, rq, sc) }
    val got = q("q_mmr").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toVector
    assert(got == want)
    // diversity must bite: the MMR picks differ from the pure-rel top-5
    val pureTop = rel.sortBy(r => (-r._2, r._1)).take(5).map(_._1).toSet
    assert(got.map(_._2).toSet != pureTop || got.map(_._4).min < got.map(_._3).max,
      "MMR degenerated to plain top-k with no similarity penalty in play")
  }

  test("Croston level/interval recursion replays") {
    val daily = eventsTable(dir)
      .filter("event_type = 'purchase' AND value >= 250")
      .selectExpr("date_format(CAST(ts AS DATE), 'yyyy-MM-dd') AS day")
      .collect().map(_.getString(0))
      .groupBy(identity).map { case (d, xs) => (d, xs.size.toLong) }
      .toSeq.sortBy(_._1)
    assert(daily.nonEmpty, "no intermittent demand at sf0.001 — raise data")
    val d0 = java.time.LocalDate.parse(daily.head._1)
    var z = daily.head._2; var p = 0L; var prevT = 0L
    val want = daily.zipWithIndex.map { case ((day, x), i) =>
      val t = java.time.temporal.ChronoUnit.DAYS
        .between(d0, java.time.LocalDate.parse(day))
      if (i == 0) p = t + 1
      else { z = (z + x) / 2; p = (p + (t - prevT)) / 2 }
      prevT = t
      (day, x, z, p, z * 1000L / p)
    }
    val got = q("q_croston").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq.sortBy(_._1)
    assert(got == want.sortBy(_._1))
    // intermittency: demand days are a strict subset of active days
    // (p_interval can still collapse to 1 after halving at tiny SF)
    val allDays = eventsTable(dir)
      .selectExpr("CAST(ts AS DATE)").distinct().count()
    assert(got.length < allDays,
      s"demand on all $allDays days — series not intermittent")
    assert(got.forall(_._4 >= 1L))
  }

  test("pairwise JS divergence replays; symmetric and bounded") {
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("source", "trim(lower(text)) AS t").collect()
      .flatMap(r => r.getString(1).split("\\s+").map(t => (r.getString(0), t)))
    val cnt = toks.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    val tot = toks.groupBy(_._1).map { case (s, xs) => (s, xs.size.toLong) }
    def lnQ6(x: BigInt): Long = math.floor(math.log(x.toDouble) * 1e6).toLong
    def sdivRaw(a: BigInt, b: BigInt): BigInt =
      if (a >= 0) a / b else -((-a) / b)
    val srcs = tot.keys.toSeq.sorted
    val want = (for {
      i <- srcs.indices; j <- (i + 1) until srcs.length
    } yield {
      val (sa, sb) = (srcs(i), srcs(j))
      val (ta, tb) = (BigInt(tot(sa)), BigInt(tot(sb)))
      def half(x: String, y: String, tx: BigInt, ty: BigInt): BigInt = {
        val sum = cnt.collect { case ((s, t), c) if s == x =>
          val cb = BigInt(cnt.getOrElse((y, t), 0L))
          BigInt(c) * (lnQ6(2 * BigInt(c) * ty) - lnQ6(BigInt(c) * ty + cb * tx))
        }.sum
        sdivRaw(sum, 2 * tx)
      }
      (sa, sb, (half(sa, sb, ta, tb) + half(sb, sa, tb, ta)).toLong)
    }).toSet
    val got = q("q_js_divergence").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want)
    // JS ∈ [0, ln 2] — in micro: [0, 693147]; and sources must differ
    assert(got.forall(g => g._3 >= -5L && g._3 <= 693147L))
    assert(got.exists(_._3 > 0L), "all sources identical — vacuous")
  }
}
