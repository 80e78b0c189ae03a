package graft

/** q_conformal_interval, q_kneser_ney, q_bradley_terry,
  * q_cooks_distance: driver-side replays of the round-10 conformal /
  * LM-smoothing / preference-ranking / regression-diagnostics surface. */
class ConformalRankingOpsSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"
  private def q(key: String) = SparkEntry.queries(key)(spark, dir)

  private val mod = BigInt("36028797018963913")
  private def bucket(id: Long): Int =
    ((BigInt(id) * BigInt("6364136223846793005") mod mod) % 4).toInt

  test("conformal interval replays; coverage honors the 90% guarantee") {
    val rows = spark.read.parquet(s"$dir/orders.parquet")
      .selectExpr("o_orderkey",
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS LONG) AS cents",
        "CAST(substr(o_orderpriority, 1, 1) AS INT) AS g")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val train = rows.filter(r => bucket(r._1) < 2)
    val fit = train.groupBy(_._3).map { case (g, xs) =>
      (g, xs.map(_._2).sum / xs.length) // floor division on positives
    }
    val cal = rows.filter(r => bucket(r._1) == 2)
      .map(r => (r._1, (r._2 - fit(r._3)).abs)).sortBy(p => (p._2, p._1))
    val k = math.min((9 * (cal.length + 1) + 9) / 10, cal.length)
    val qhat = cal(k - 1)._2
    val test = rows.filter(r => bucket(r._1) == 3)
    val cov = test.count(r => (r._2 - fit(r._3)).abs <= qhat)
    val r = q("q_conformal_interval").collect().head
    assert(r.getLong(0) == train.length && r.getLong(1) == cal.length
      && r.getLong(2) == test.length)
    assert(r.getLong(3) == qhat, "qhat_cents")
    assert(r.getLong(4) == cov.toLong * 1000000L / test.length, "coverage_ppm")
    // the split-conformal marginal guarantee: coverage ≈ 90% (wide
    // tolerance — sf0.001 has a small test split)
    assert(r.getLong(4) > 800000L && r.getLong(4) <= 1000000L,
      s"coverage ${r.getLong(4)} ppm violates the conformal guarantee band")
  }

  test("Kneser-Ney doc scores replay from the definitional counts") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id", "trim(lower(text)) AS t").collect()
      .map(r => (r.getLong(0), r.getString(1).split("\\s+").toSeq))
    // vocab: top-256 by doc frequency, ties by token asc
    val df = docs.flatMap(d => d._2.distinct.map(t => t))
      .groupBy(identity).map { case (t, xs) => (t, xs.length) }
    val vocab = df.toSeq.sortBy { case (t, d) => (-d, t) }.take(256)
      .zipWithIndex.map { case ((t, _), i) => (t, i + 1) }.toMap
    val seqs = docs.map { case (id, ts) => (id, ts.map(t => vocab.getOrElse(t, 0))) }
    val pairs = seqs.flatMap { case (id, ids) =>
      ids.zip(ids.drop(1)).map(p => (id, p._1, p._2))
    }
    val c12 = pairs.groupBy(p => (p._2, p._3)).map { case (k, v) => (k, v.size.toLong) }
    val c1 = c12.groupBy(_._1._1).map { case (v, m) => (v, m.values.sum) }
    val n1post = c12.groupBy(_._1._1).map { case (v, m) => (v, m.size.toLong) }
    val n1pre = c12.groupBy(_._1._2).map { case (w, m) => (w, m.size.toLong) }
    val tt = c12.size.toLong
    def lnQ6(x: BigInt): Long = math.floor(math.log(x.toDouble) * 1e6).toLong
    val want = pairs.groupBy(_._1).map { case (id, ps) =>
      val s = ps.map { case (_, v, w) =>
        val num = (BigInt(0).max(BigInt(4 * c12((v, w)) - 3)) * tt
          + BigInt(3) * n1post(v) * n1pre(w)) * BigInt("1000000000000")
        val p = (num / (BigInt(4) * c1(v) * tt)).max(1)
        lnQ6(p) - 27631021L
      }.sum
      (id, ps.length.toLong, s)
    }.toSet
    val got = q("q_kneser_ney").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    // KN log-probs are genuinely negative (it's a proper distribution)
    assert(got.forall(_._3 < 0L))
  }

  test("Bradley-Terry MM strengths replay; strengths track win rates") {
    val daily = eventsTable(dir)
      .selectExpr("CAST(ts AS DATE) AS d", "event_type").collect()
      .map(r => (r.getDate(0).toString, r.getString(1)))
      .groupBy(identity).map { case (k, v) => (k._1, k._2, v.size.toLong) }
      .toSeq
    val byDay = daily.groupBy(_._1)
    val matches = byDay.values.flatMap { cs =>
      val m = cs.map(c => (c._2, c._3)).sortBy(_._1)
      for {
        i <- m.indices; j <- (i + 1) until m.length
        if m(i)._2 != m(j)._2
      } yield (m(i)._1, m(j)._1, if (m(i)._2 > m(j)._2) 1L else 0L)
    }.toSeq
    val grouped = matches.groupBy(p => (p._1, p._2))
      .map { case (k, v) => (k._1, k._2, v.size.toLong, v.map(_._3).sum) }.toSeq
    val types = grouped.flatMap(g => Seq(g._1, g._2)).distinct.sorted
    val wins = types.map(t => t -> (
      grouped.filter(_._1 == t).map(_._4).sum +
        grouped.filter(_._2 == t).map(g => g._3 - g._4).sum)).toMap
    val nij = grouped.flatMap(g =>
      Seq(((g._1, g._2), g._3), ((g._2, g._1), g._3))).toMap
    var p = types.map(t => t -> 1000000L).toMap
    for (_ <- 1 to 3) {
      val un = types.map { t =>
        val den = types.filter(_ != t).map { u =>
          nij.get((t, u)).fold(0L)(n => n * 1000000L * 1000000L / (p(t) + p(u)))
        }.sum
        t -> (if (den == 0) p(t) else wins(t) * 1000000L * 1000000L / den)
      }.toMap
      val tot = un.values.sum
      p = un.map { case (t, v) =>
        t -> (BigInt(v) * types.length * 1000000 / tot).toLong
      }
    }
    val want = types.map(t => (t, wins(t), p(t))).toSet
    val got = q("q_bradley_terry").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    // the MM fixed point must rank the biggest winner on top
    val best = got.maxBy(_._3)
    assert(best._2 == got.map(_._2).max,
      s"top strength ${best._1} is not the top winner")
  }

  test("Cook's-distance top-5 replays from exact moment arithmetic") {
    val daily = spark.read.parquet(s"$dir/orders.parquet")
      .selectExpr("date_format(o_orderdate, 'yyyy-MM-dd') AS day",
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS LONG) AS cents")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (d, xs) => (d, xs.map(_._2).sum) }.toSeq
      .sortBy(_._1)
    val d0 = java.time.LocalDate.parse(daily.head._1)
    val xy = daily.map { case (d, y) =>
      (d, java.time.temporal.ChronoUnit.DAYS
        .between(d0, java.time.LocalDate.parse(d)), BigInt(y))
    }
    val n = BigInt(xy.length)
    val sx = xy.map(p => BigInt(p._2)).sum
    val sxx = xy.map(p => BigInt(p._2) * p._2).sum
    val sy = xy.map(_._3).sum
    val sxy = xy.map(p => BigInt(p._2) * p._3).sum
    val dx = n * sxx - sx * sx
    def sdiv(a: BigInt, b: BigInt): BigInt =
      if (a >= 0) a * 1000000 / b else -((-a) * 1000000 / b)
    def sdivRaw(a: BigInt, b: BigInt): BigInt =
      if (a >= 0) a / b else -((-a) / b)
    val bppm = sdiv(n * sxy - sx * sy, dx)
    val appm = sdiv(sy * sxx - sx * sxy, dx)
    val rows = xy.map { case (d, x, y) =>
      val h = ((dx + (n * x - sx) * (n * x - sx)) * 1000000) / (n * dx)
      val rm = y * 1000 - sdivRaw(bppm * x * 1000 + appm * 1000, BigInt(1000000))
      (d, h, rm, sdivRaw(rm, 1000))
    }
    val sse = rows.map(r => r._4 * r._4).sum.max(1)
    val want = rows.map { case (d, h, rm, ec) =>
      val t1 = ec * ec * 1000 * (n - 2) / sse
      val t2 = t1 * h / (BigInt(1000000) - h).max(1)
      val dm = t2 * 500000 / (BigInt(1000000) - h).max(1)
      (d, h.toLong, rm.toLong, dm.toLong)
    }.sortBy(r => (-r._4, r._1)).take(5)
    val got = q("q_cooks_distance").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == want)
    // influence scores must discriminate (not all equal/zero)
    assert(got.map(_._4).distinct.size > 1, "flat influence — vacuous")
  }
}
