package graft

import org.apache.spark.sql.functions._

/** Ops 261-270 (round-8 widening X-XI, survey estimation + QC):
  * attempt-conversion curve, AAPOR rates, Horvitz–Thompson,
  * stratum variance, straight-lining, ICC, NPS, Wilson CI, Fleiss κ,
  * weighted median — each replayed independently on the driver at
  * sf0.001 with plain Scala collections (the CorpusBuildSpec
  * discipline). Cents conversions (DECIMAL(18,2) HALF_UP rounding)
  * are extracted in the Spark select, as in TrainingOpsSpec: the
  * replay covers the operator's logic, not the decimal cast. */
class SurveyOpsSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"

  private def ppm(num: Long, den: Long): Long = {
    require(num >= 0 && den > 0)
    num * 1000000L / den
  }

  // sign-split ppm of a possibly-negative exact numerator: both engines
  // agree only on nonnegative integer division, so the replay mirrors
  // the production sign-split
  private def signPpm(num: BigInt, den: BigInt): Long = {
    require(den > 0)
    if (num >= 0) (num * 1000000 / den).toLong
    else -((-num * 1000000) / den).toLong
  }

  private lazy val ev: Seq[(Long, Long, String, Long)] =
    eventsTable(dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .toSeq

  test("q_attempt_conversion equals the driver replay; curve is monotone") {
    // .toSeq BEFORE .map: mapping a Map to Tuple2s would rebuild a Map
    // and silently dedup per-user rows by key
    val perUser = ev.groupBy(_._2).toSeq.map { case (_, es) =>
      val fp = es.filter(_._3 == "purchase").map(_._4).sorted.headOption
      val attempts = es.count(e =>
        e._3 == "view" && fp.forall(e._4 <= _)).toLong
      (attempts, if (fp.isDefined) 1L else 0L)
    }
    val grouped = perUser.groupBy(_._1).map { case (a, xs) =>
      (a, xs.size.toLong, xs.map(_._2).sum)
    }.toSeq.sortBy(-_._1)
    // hazard rate: converted AT k over users REACHING k (per-finisher
    // conversion pinned to 1e6 on this fixture — everyone converts)
    val want = grouped.scanLeft((0L, 0L, 0L, 0L)) {
      case ((_, _, _, reach), (a, nu, nc)) => (a, nu, nc, reach + nu)
    }.drop(1).map { case (a, nu, nc, reach) =>
      (a, nu, nc, reach, ppm(nc, reach))
    }.toSet
    val got = SparkEntry.queries("q_attempt_conversion")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSet
    assert(got == want)
    // users_reaching is a suffix sum: strictly increasing as attempts fall
    val byAttempts = got.toSeq.sortBy(_._1)
    assert(byAttempts.map(_._4).reverse == byAttempts.map(_._4).reverse.sorted)
  }

  test("q_aapor_rates equals the driver replay; dispositions partition users") {
    // first-5-events slice (full histories collapse to 100% complete)
    val byUser = ev.groupBy(_._2)
    val flags = byUser.map { case (_, es) =>
      val first5 = es.sortBy(e => (e._4, e._1)).take(5)
      (first5.exists(_._3 == "purchase"), first5.exists(_._3 == "click"),
        first5.exists(_._3 == "view"))
    }.toSeq
    // the bounded slice must make every disposition category REAL at
    // this SF — the vacuity condition the full-history version failed
    assert(flags.exists(f => !f._1 && f._2), "need partials")
    assert(flags.exists(f => !f._1 && !f._2 && f._3), "need contact-only")
    val nTot = flags.size.toLong
    val nC = flags.count(_._1).toLong
    val nP = flags.count(f => !f._1 && f._2).toLong
    val nCo = flags.count(f => !f._1 && !f._2 && f._3).toLong
    val nNc = flags.count(f => !f._1 && !f._2 && !f._3).toLong
    val contacted = nC + nP + nCo
    val want = (nTot, nC, nP, nCo, nNc, ppm(nC, nTot), ppm(contacted, nTot),
      if (contacted > 0) ppm(nC, contacted) else 0L,
      if (contacted > 0) ppm(nP, contacted) else 0L)
    val r = SparkEntry.queries("q_aapor_rates")(spark, dir).collect().head
    val got = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8))
    assert(got == want)
    assert(nC + nP + nCo + nNc == nTot)
  }

  private lazy val custRows: Seq[(Long, Long, String, Long)] =
    spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey"), col("c_nationkey").cast("long"),
        col("c_mktsegment"),
        (col("c_acctbal").cast("decimal(18,2)") * 100).cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .toSeq

  private lazy val nations: Map[Long, String] =
    spark.read.parquet(s"$dir/nation.parquet")
      .select(col("n_nationkey").cast("long"), col("n_name"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap

  private lazy val fulfilled: Map[Long, Long] =
    spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderstatus") === "F")
      .groupBy("o_custkey").agg(count(lit(1)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

  test("q_horvitz_thompson equals the driver replay; covered strata estimate the total") {
    val strata = custRows.groupBy(c => (c._2, c._3))
    val want = strata.map { case ((nk, seg), cs) =>
      val pop = cs.size.toLong
      val trueCents = cs.map(_._4).sum
      val resp = cs.filter(c => fulfilled.contains(c._1))
      if (resp.isEmpty)
        (nations(nk), seg, pop, 0L, trueCents, 0L, 0, 0L)
      else {
        val rc = BigInt(resp.map(_._4).sum)
        val ht =
          if (rc >= 0) (BigInt(pop) * rc / resp.size).toLong
          else -((BigInt(pop) * (-rc)) / resp.size).toLong
        (nations(nk), seg, pop, resp.size.toLong, trueCents, ht, 1,
          ht - trueCents)
      }
    }.toSet
    val got = SparkEntry.queries("q_horvitz_thompson")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getInt(6), r.getLong(7)))
      .toSet
    assert(got == want)
  }

  test("q_stratum_variance equals the driver replay; FPC shrinks the variance") {
    val byNk = custRows.groupBy(_._2)
    val want = byNk.flatMap { case (nk, cs) =>
      val pop = cs.size.toLong
      val resp = cs.filter(c => fulfilled.contains(c._1))
      if (resp.isEmpty) None
      else {
        val nRep = resp.count(c => fulfilled(c._1) >= 2).toLong
        val p = ppm(nRep, resp.size.toLong)
        val v = p * (1000000L - p) / resp.size
        val vf = if (pop > 1) v * (pop - resp.size) / (pop - 1) else 0L
        Some((nations(nk), pop, resp.size.toLong, nRep, p, v, vf))
      }
    }.toSet
    val got = SparkEntry.queries("q_stratum_variance")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
      .toSet
    assert(got == want)
    got.foreach { g => assert(g._7 <= g._6) }
  }

  test("q_straightline equals the driver replay; flags need run>=5 over n>=8") {
    // .toSeq BEFORE .map — same Map-rebuild dedup trap as above
    val perUser = ev.groupBy(_._2).toSeq.map { case (_, es) =>
      val ordered = es.sortBy(e => (e._4, e._1)).map(_._3)
      val runs = ordered.foldLeft(List.empty[(String, Long)]) {
        case ((t, n) :: rest, e) if t == e => (t, n + 1) :: rest
        case (acc, e)                      => (e, 1L) :: acc
      }
      (runs.map(_._2).max, ordered.size.toLong)
    }
    val want = perUser.groupBy(_._1).map { case (mr, xs) =>
      (mr, xs.size.toLong,
        xs.count(x => x._1 >= 5 && x._2 >= 8).toLong)
    }.toSet
    val got = SparkEntry.queries("q_straightline")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    got.filter(_._1 < 5).foreach(g => assert(g._3 == 0L))
  }

  test("q_icc_anova equals the driver BigInt replay") {
    val first2 = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_custkey"),
        unix_micros(col("o_orderdate").cast("timestamp")),
        col("o_orderkey"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
      .map { case (_, os) => os.sortBy(o => (o._2, o._3)).take(2) }
      .filter(_.size == 2)
    val k = BigInt(first2.size)
    val a = first2.flatMap(_.map(o => BigInt(o._4) * o._4)).sum
    val b = first2.map(os => { val s = BigInt(os.map(_._4).sum); s * s }).sum
    val t = first2.map(os => BigInt(os.map(_._4).sum)).sum
    val num = k * b - t * t - (k - 1) * (2 * a - b)
    val den = k * b - t * t + (k - 1) * (2 * a - b)
    val want = (k.toLong, k.toLong * 2, signPpm(num, den))
    val r = SparkEntry.queries("q_icc_anova")(spark, dir).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == want)
    // a correlation: bounded
    assert(math.abs(r.getLong(2)) <= 1000000L)
  }

  test("q_nps equals the driver replay; bands partition respondents") {
    val want = custRows.groupBy(_._3).map { case (seg, cs) =>
      val n = cs.size.toLong
      val scores = cs.sortBy(c => (c._4, c._1)).zipWithIndex
        .map { case (_, i) => i.toLong * 11 / n }
      val prom = scores.count(_ >= 9).toLong
      val pass = scores.count(s => s >= 7 && s <= 8).toLong
      val det = scores.count(_ <= 6).toLong
      (seg, n, prom, pass, det, signPpm(BigInt(prom - det), BigInt(n)))
    }.toSet
    val got = SparkEntry.queries("q_nps")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toSet
    assert(got == want)
    got.foreach(g => assert(g._3 + g._4 + g._5 == g._2))
  }

  test("q_wilson_ci equals the driver replay; the interval brackets p_hat") {
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = custRows.groupBy(_._3).map { case (seg, cs) =>
      val n = cs.size.toLong
      val k = cs.count(c => fulfilled.contains(c._1)).toLong
      val center = (k + 1.9208) / (n + 3.8416)
      val margin = 1.96 * math.sqrt(
        k.toDouble * (n - k).toDouble / n.toDouble + 0.9604) / (n + 3.8416)
      (seg, n, k, r6(k.toDouble / n.toDouble),
        r6(center - margin), r6(center + margin))
    }.toSet
    val got = SparkEntry.queries("q_wilson_ci")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
      .toSet
    assert(got == want)
    got.foreach { g =>
      assert(g._5 <= g._4 && g._4 <= g._6)
      assert(g._5 >= 0.0 - 1e-9 && g._6 <= 1.0 + 1e-9)
    }
  }

  test("q_fleiss_kappa equals the driver BigInt replay") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("text")).collect().map(_.getString(0)).toSeq
    val ks = docs.map { text =>
      val toks = text.trim.split("\\s+").toSeq
      val nc = text.replaceAll("\\s+", "").length.toLong
      val ra = if (toks.size >= 25) 1 else 0
      val rb = if (toks.distinct.size * 10 >= toks.size * 4) 1 else 0
      val rc = if (nc * 10 >= toks.size * 30L && nc * 10 < toks.size * 80L) 1
               else 0
      ra + rb + rc
    }
    val n = BigInt(ks.size)
    val sSum = BigInt(ks.map(_.toLong).sum)
    val a6 = BigInt(ks.map(k => if (k == 0 || k == 3) 6L else 2L).sum)
    val pairSq = sSum * sSum + (3 * n - sSum) * (3 * n - sSum)
    val num = 3 * n * a6 - 2 * pairSq
    val den = 18 * n * n - 2 * pairSq
    val want = (n.toLong, sSum.toLong, a6.toLong, signPpm(num, den))
    val r = SparkEntry.queries("q_fleiss_kappa")(spark, dir).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == want)
    assert(math.abs(r.getLong(3)) <= 1000000L)
  }

  private lazy val orders: Seq[(Long, String, Long)] =
    spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_custkey"), col("o_orderstatus"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq

  test("q_jackknife equals the driver BigInt replay") {
    val nkOf = custRows.map(c => (c._1, c._2)).toMap
    val perNation = orders.filter(_._2 == "F")
      .groupBy(o => nkOf(o._1)).toSeq
      .map { case (_, os) => (os.map(_._3).sum, os.size.toLong) }
    val ty = perNation.map(_._1).sum
    val tn = perNation.map(_._2).sum
    val thetas = perNation.filter(_._2 < tn)
      .map { case (y, n) => (ty - y) / (tn - n) }
    val k = BigInt(thetas.size)
    val qq = thetas.map(t => BigInt(t) * t).sum
    val ss = BigInt(thetas.sum)
    val want = (perNation.size.toLong, thetas.size.toLong, ty / tn,
      ((k - 1) * (k * qq - ss * ss) / (k * k)).toLong)
    val r = SparkEntry.queries("q_jackknife")(spark, dir).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == want)
    assert(r.getLong(3) >= 0)
  }

  test("q_ratio_estimator equals the driver replay; full-frame sample is exact") {
    val nkOf = custRows.map(c => (c._1, c._2)).toMap
    val perCust = orders.groupBy(_._1).toSeq.map { case (ck, os) =>
      (ck, nkOf(ck), os.map(_._3).sum,
        os.filter(_._2 == "F").map(_._3).sum)
    }
    val want = perCust.groupBy(_._2).flatMap { case (nk, cs) =>
      val xPop = cs.map(_._3).sum
      val yTrue = cs.map(_._4).sum
      val sample = cs.filter(c => c._1 % 5 == 0)
      val xs = sample.map(_._3).sum
      val ys = sample.map(_._4).sum
      if (xs <= 0) None
      else {
        val yr = (BigInt(xPop) * ys / xs).toLong
        Some((nations(nk), xPop, xs, ys, yTrue, yr, yr - yTrue))
      }
    }.toSet
    val got = SparkEntry.queries("q_ratio_estimator")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
      .toSet
    assert(got == want)
  }

  test("q_mcnemar equals the driver replay; cells partition the corpus") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("text")).collect().map(_.getString(0)).toSeq
    val cells = docs.map { text =>
      val toks = text.trim.split("\\s+").toSeq
      (toks.size >= 25, toks.distinct.size * 10 >= toks.size * 4)
    }
    val b = cells.count(c => c._1 && !c._2).toLong
    val c = cells.count(x => !x._1 && x._2).toLong
    val want = (docs.size.toLong, cells.count(x => x._1 && x._2).toLong,
      b, c, cells.count(x => !x._1 && !x._2).toLong,
      if (b + c > 0) (b - c) * (b - c) * 1000000L / (b + c) else 0L)
    val r = SparkEntry.queries("q_mcnemar")(spark, dir).collect().head
    val got = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5))
    assert(got == want)
    assert(got._2 + got._3 + got._4 + got._5 == got._1)
  }

  test("q_hot_deck equals the driver replay; donors are observed rows") {
    val want = custRows.groupBy(c => (c._2, c._3)).toSeq.flatMap {
      case ((nk, seg), cs) =>
        val missing = cs.filter(_._1 % 7 == 3)
        val observed = cs.filter(_._1 % 7 != 3)
        if (observed.isEmpty) None
        else {
          val donor = observed.maxBy(_._1)._4
          val trueMiss = missing.map(_._4).sum
          Some((nations(nk), seg, cs.size.toLong, missing.size.toLong,
            donor, trueMiss, missing.size * donor - trueMiss))
        }
    }.toSet
    val got = SparkEntry.queries("q_hot_deck")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
      .toSet
    assert(got == want)
  }

  test("q_cronbach_alpha equals the driver BigInt replay; alpha is bounded above by 1") {
    val perUser = ev.groupBy(_._2).toSeq.map { case (_, es) =>
      (es.count(_._3 == "view").toLong, es.count(_._3 == "click").toLong,
        es.count(_._3 == "purchase").toLong)
    }
    val n = BigInt(perUser.size)
    def fold(xs: Seq[Long]): BigInt =
      n * xs.map(x => BigInt(x) * x).sum - BigInt(xs.sum) * BigInt(xs.sum)
    val vi = fold(perUser.map(_._1)) + fold(perUser.map(_._2)) +
      fold(perUser.map(_._3))
    val vt = fold(perUser.map(u => u._1 + u._2 + u._3))
    val alpha =
      if (vt <= 0) 0L
      else if (3 * (vt - vi) >= 0) (3 * (vt - vi) * 1000000 / (2 * vt)).toLong
      else -((3 * (vi - vt) * 1000000) / (2 * vt)).toLong
    val r = SparkEntry.queries("q_cronbach_alpha")(spark, dir).collect().head
    assert((r.getLong(0), r.getLong(1)) == ((n.toLong, alpha)))
    // k/(k-1)*(1 - vi/vt) <= k/(k-1)*1, and vi >= 0 forces <= 1.5e6;
    // the classical bound alpha <= 1 holds whenever vi >= vt/3
    assert(r.getLong(1) <= 1500000L)
  }

  test("q_weighted_median equals the driver replay; half the weight sits each side") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_returnflag"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long"),
        col("l_quantity").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val want = li.groupBy(_._1).map { case (flag, xs) =>
      val byCents = xs.groupBy(_._2).view.mapValues(_.map(_._3).sum)
        .toSeq.sortBy(_._1)
      val tot = byCents.map(_._2).sum
      val med = byCents.scanLeft((0L, 0L)) { case ((_, c), (p, w)) =>
        (p, c + w)
      }.drop(1).find(pc => pc._2 * 2 >= tot).get._1
      (flag, med, tot)
    }.toSet
    val got = SparkEntry.queries("q_weighted_median")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    // the defining property, checked directly against the raw rows
    want.foreach { case (flag, med, tot) =>
      val below = li.filter(x => x._1 == flag && x._2 <= med).map(_._3).sum
      val above = li.filter(x => x._1 == flag && x._2 >= med).map(_._3).sum
      assert(below * 2 >= tot && above * 2 >= tot - 1)
    }
  }

  /** Spark's round(·, 6) on a double: BigDecimal HALF_UP at scale 6 —
    * the replays must round the way the engine does, not via %.6f. */
  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q_krippendorff equals the driver BigInt replay; alpha <= 1e6 and <= observed agreement") {
    val labels = spark.read.parquet(s"$dir/documents.parquet")
      .select(operators.TextAnalysis.langId(col("text")),
        operators.TextAnalysis.langId(substring(col("text"), 1, 120)))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val n = BigInt(labels.size)
    val d = BigInt(labels.count(p => p._1 != p._2))
    val marg = (labels.map(_._1) ++ labels.map(_._2))
      .groupBy(identity).values.map(v => BigInt(v.size))
    val q = marg.map(m => m * m).sum
    val a = 4 * n * n - q
    val num = a - 2 * d * (2 * n - 1)
    val alpha =
      if (a == 0) 1000000L
      else if (num >= 0) (num * 1000000 / a).toLong
      else -((-num * 1000000) / a).toLong
    val doPpm = (d * 1000000 / n).toLong
    val dePpm = (a * 1000000 / (2 * n * (2 * n - 1))).toLong
    val r = SparkEntry.queries("q_krippendorff")(spark, dir).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((n.toLong, d.toLong, doPpm, dePpm, alpha)))
    assert(alpha <= 1000000L)
    // alpha = 1 - Do/De can't exceed the raw agreement share
    assert(alpha <= 1000000L - doPpm + 1)
  }

  test("q_cochran_armitage equals the driver replay computed in the same operation order") {
    val rows = spark.read.parquet(s"$dir/orders.parquet")
      .select(substring(col("o_orderpriority"), 1, 1).cast("long"),
        (col("o_orderstatus") === "F").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val g = rows.groupBy(_._1).map { case (w, xs) =>
      (w, xs.size.toLong, xs.map(_._2).sum)
    }.toSeq
    val (k, n, x) = (g.size.toLong, g.map(_._2).sum, g.map(_._3).sum)
    val sw = g.map(t => t._1 * t._2).sum
    val sww = g.map(t => t._1 * t._1 * t._2).sum
    val sx = g.map(t => t._1 * t._3).sum
    val varW = sww.toDouble / n - (sw.toDouble / n) * (sw.toDouble / n)
    val z =
      if (x > 0 && x < n && k > 1 && varW > 0)
        r6((sx.toDouble / n - (x.toDouble / n) * (sw.toDouble / n)) *
          math.sqrt(n.toDouble) /
          math.sqrt((x.toDouble / n) * (1.0 - x.toDouble / n) * varW))
      else 0.0
    val r = SparkEntry.queries("q_cochran_armitage")(spark, dir)
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) == ((k, n, x, sw, sww, sx)))
    assert(math.abs(r.getDouble(6) - z) < 1e-9)
  }

  test("q_kendall_tau equals the driver pair replay; counts partition the pairs") {
    val daily = ev.groupBy(e => e._4 / 86400000000L).toSeq
      .map { case (day, es) =>
        (day, es.size.toLong, es.map(_._2).distinct.size.toLong)
      }.sortBy(_._1)
    val pairs = for {
      i <- daily.indices; j <- (i + 1) until daily.size
    } yield (daily(i)._2, daily(i)._3, daily(j)._2, daily(j)._3)
    val np = pairs.size.toLong
    val c = pairs.count(p => (p._1 < p._3 && p._2 < p._4) ||
      (p._1 > p._3 && p._2 > p._4)).toLong
    val dd = pairs.count(p => (p._1 < p._3 && p._2 > p._4) ||
      (p._1 > p._3 && p._2 < p._4)).toLong
    val tx = pairs.count(p => p._1 == p._3 && p._2 != p._4).toLong
    val ty = pairs.count(p => p._1 != p._3 && p._2 == p._4).toLong
    val txy = pairs.count(p => p._1 == p._3 && p._2 == p._4).toLong
    val tau =
      if (np - tx - txy > 0 && np - ty - txy > 0)
        r6((c - dd).toDouble /
          math.sqrt((np - tx - txy).toDouble * (np - ty - txy).toDouble))
      else 0.0
    val r = SparkEntry.queries("q_kendall_tau")(spark, dir).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) == ((np, c, dd, tx, ty, txy)))
    assert(math.abs(r.getDouble(6) - tau) < 1e-9)
    assert(c + dd + tx + ty + txy == np)
  }

  test("q_greg_estimator equals the driver staged-BigInt replay; zero-slope cells reduce to expansion") {
    val perCust = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_custkey"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"),
        when(col("o_orderstatus") === "F",
          (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
          .otherwise(0L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      .groupBy(_._1).map { case (ck, os) =>
        (ck, os.map(_._2).sum, os.map(_._3).sum)
      }
    val nations = spark.read.parquet(s"$dir/nation.parquet")
      .select(col("n_nationkey").cast("long"), col("n_name"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val custNk = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey"), col("c_nationkey").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = perCust.toSeq.flatMap { case (ck, x, y) =>
      custNk.get(ck).map(nk => (nk, ck, x, y))
    }.groupBy(_._1).flatMap { case (nk, cs) =>
      val samp = cs.filter(c => c._2 % 5 == 0)
      if (samp.isEmpty) None else {
        val (nf, ns) = (BigInt(cs.size), BigInt(samp.size))
        val xPop = cs.map(c => BigInt(c._3)).sum
        val yTrue = cs.map(c => BigInt(c._4)).sum
        val sxS = samp.map(c => BigInt(c._3)).sum
        val syS = samp.map(c => BigInt(c._4)).sum
        val sxx = samp.map(c => BigInt(c._3) * c._3).sum
        val sxy = samp.map(c => BigInt(c._3) * c._4).sum
        val dx = ns * sxx - sxS * sxS
        val bn = ns * sxy - sxS * syS
        val bPpm =
          if (dx <= 0) BigInt(0)
          else if (bn >= 0) bn * 1000000 / dx
          else -((-bn * 1000000) / dx)
        val u = ns * xPop - nf * sxS
        val v = bPpm * u
        val adj = if (v >= 0) v / (ns * 1000000) else -((-v) / (ns * 1000000))
        val yGreg = (nf * syS) / ns + adj
        Some((nations(nk), nf.toLong, ns.toLong, xPop.toLong, yTrue.toLong,
          bPpm.toLong, yGreg.toLong, (yGreg - yTrue).toLong))
      }
    }.toSet
    val got = SparkEntry.queries("q_greg_estimator")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
      .toSet
    assert(got == want)
  }

  test("q_cramers_v equals the driver full-grid replay; V lives in [0, 1]") {
    val custSeg = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val obs = spark.read.parquet(s"$dir/orders.parquet")
      .select(substring(col("o_orderpriority"), 1, 1), col("o_custkey"))
      .collect().map(r => (r.getString(0), custSeg(r.getLong(1))))
      .groupBy(identity).view.mapValues(v => BigInt(v.size)).toMap
    val n = obs.values.sum
    val rMarg = obs.toSeq.groupBy(_._1._1).view
      .mapValues(_.map(_._2).sum).toMap
    val cMarg = obs.toSeq.groupBy(_._1._2).view
      .mapValues(_.map(_._2).sum).toMap
    val chi2 = (for {
      (w, rm) <- rMarg.toSeq; (s, cm) <- cMarg.toSeq
    } yield {
      val o = obs.getOrElse((w, s), BigInt(0))
      val diff = o * n - rm * cm
      diff * diff * 1000000 / (n * rm * cm)
    }).sum
    val m = math.min(rMarg.size, cMarg.size).toLong - 1
    val v =
      if (n > 0 && m > 0)
        r6(math.sqrt(chi2.toDouble / 1000000.0 / n.toDouble / m.toDouble))
      else 0.0
    val r = SparkEntry.queries("q_cramers_v")(spark, dir).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((n.toLong, rMarg.size.toLong, cMarg.size.toLong, chi2.toLong)))
    assert(math.abs(r.getDouble(4) - v) < 1e-9)
    assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
  }
}
