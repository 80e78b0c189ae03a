package graft

/** q_logrank, q_gpd_pot, q_chao1, q_good_turing: driver-side replays
  * of the round-10 survival-comparison / extreme-value / vocabulary-
  * richness / smoothing surface. */
class SurvivalExtremesVocabOpsSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"
  private def q(key: String) = SparkEntry.queries(key)(spark, dir)

  test("log-rank chi-square replays from the risk-table fold") {
    val ev = eventsTable(dir)
      .selectExpr("user_id", "CAST(ts AS DATE) AS d", "event_type", "ts")
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate,
        r.getString(2), r.getTimestamp(3)))
    val grp = ev.groupBy(_._1).map { case (u, xs) =>
      val first = xs.minBy(x => (x._4.getTime, x._3))
      (u, if (first._3 == "purchase") 1 else 0)
    }
    val life = ev.groupBy(_._1).toSeq.map { case (u, xs) =>
      (xs.map(_._2).min, xs.map(_._2).max, grp(u))
    }
    val gmax = life.map(_._2).max
    val ten = life.map { case (d0, d1, g) =>
      (java.time.temporal.ChronoUnit.DAYS.between(d0, d1).toInt,
        if (d1.isBefore(gmax)) 1L else 0L, g)
    }.groupBy(_._1).toSeq.map { case (t, xs) =>
      (t, xs.length.toLong, xs.map(_._2).sum,
        xs.count(_._3 == 1).toLong, xs.filter(_._3 == 1).map(_._2).sum)
    }.sortBy(_._1)
    var n = ten.map(_._2).sum; var n1 = ten.map(_._4).sum
    var obs1 = 0L; var se1 = BigInt(0); var sv = BigInt(0); var times = 0L
    for ((_, eAll, d, e1, d1) <- ten) {
      if (d > 0 && n > 1) {
        times += 1; obs1 += d1
        se1 += BigInt(d) * n1 * 1000000 / n
        sv += BigInt(d) * n1 * (n - n1) * (n - d) * BigInt(1000000000) /
          (BigInt(n) * n * (n - 1))
      }
      n -= eAll; n1 -= e1
    }
    val r = q("q_logrank").collect().head
    assert(r.getLong(0) == times && r.getLong(1) == obs1)
    assert(r.getLong(2) == (se1 / 1000000).toLong, "exp1_floor")
    val dev = BigInt(obs1) * 1000000 - se1
    assert(r.getLong(3) == (dev * dev * 1000 / (sv * 1000).max(1)).toLong)
  }

  test("GPD PWM estimators replay from the sorted exceedances") {
    val cents = spark.read.parquet(s"$dir/orders.parquet")
      .selectExpr("o_orderkey",
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS LONG) AS c")
      .collect().map(r => (r.getLong(1), r.getLong(0)))
      .sortBy(identity)
    val nAll = cents.length.toLong
    val thrRank = (95 * nAll + 99) / 100
    val thr = cents((thrRank - 1).toInt)._1
    val exc = cents.drop(thrRank.toInt).map(_._1 - thr)
    val ne = BigInt(exc.length)
    val sx = exc.map(BigInt(_)).sum
    val sw = exc.zipWithIndex.map { case (x, i0) =>
      BigInt(x) * (ne - (i0 + 1))
    }.sum
    def sdiv(a: BigInt, b: BigInt): BigInt =
      if ((a >= 0) == (b >= 0)) a.abs * 1000000 / b.abs
      else -(a.abs * 1000000 / b.abs)
    val r = q("q_gpd_pot").collect().head
    assert(r.getLong(0) == exc.length.toLong && r.getLong(1) == thr)
    assert(r.getLong(2) == (sx * 1000000 / ne).toLong, "b0")
    assert(r.getLong(3) == (sw * 1000000 / (ne * (ne - 1))).toLong, "b1")
    val num = 2 * (sx * (ne - 1) - sw) - sx * (ne - 1)
    val den = sx * (ne - 1) - 2 * sw
    assert(r.getLong(4) == sdiv(num, den).toLong, "xi")
    // exceedances exist and the shape is in a sane EVT band
    assert(exc.nonEmpty && math.abs(r.getLong(4)) < 2000000L)
  }

  // 3-shingle document frequencies — the operators' count unit
  private lazy val tokenCounts: Map[String, Long] =
    spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("trim(lower(text)) AS t").collect()
      .flatMap { r =>
        val toks = r.getString(0).split("\\s+")
        val sh = if (toks.length < 3) Seq(toks.mkString(" "))
          else toks.sliding(3).map(_.mkString(" ")).toSeq
        sh.distinct
      }
      .groupBy(identity).map { case (t, xs) => (t, xs.length.toLong) }

  test("Chao1 richness and unseen mass replay") {
    val s0 = tokenCounts.size.toLong
    val nTok = tokenCounts.values.sum
    val f1 = tokenCounts.values.count(_ == 1L).toLong
    val f2 = tokenCounts.values.count(_ == 2L).toLong
    val r = q("q_chao1").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((s0, nTok, f1, f2)))
    assert(r.getLong(4) ==
      s0 + (BigInt(f1) * f1 / BigInt(2 * f2).max(1)).toLong)
    assert(r.getLong(5) == f1 * 1000000L / nTok)
    // the estimator must claim SOME unseen vocabulary remains
    assert(r.getLong(4) >= s0)
  }

  test("Good-Turing adjusted counts replay; mass identity holds") {
    val coc = tokenCounts.values.groupBy(identity)
      .map { case (r, xs) => (r, xs.size.toLong) }
    val want = coc.filter(_._1 <= 10).map { case (r, nr) =>
      val nrNext = coc.getOrElse(r + 1, 0L)
      (r, nr, nrNext, (r + 1) * nrNext * 1000L / nr)
    }.toSet
    val got = q("q_good_turing").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want)
    // GT discounts singletons when they exist (sf0.001's synthetic
    // vocab has no hapax legomena — the discount property is asserted
    // only when an r=1 row is present; the replay equality above
    // covers the table either way)
    assert(got.nonEmpty)
    got.find(_._1 == 1L).foreach { r1 =>
      assert(r1._4 < 1000L, s"r*(1)=${r1._4} milli — no discounting")
    }
  }
}
