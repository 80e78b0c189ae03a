package graft

import org.apache.spark.sql.functions._

/** Ops 300-305 (round-8 widening, statistics completion): Levene,
  * effect sizes, BH-FDR, Q–Q deciles, Jarque–Bera, Durbin–Watson —
  * driver replays at sf0.001 with plain Scala collections. */
class NormalityOpsSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"

  private lazy val dollarsByG: Map[String, Seq[Long]] =
    spark.read.parquet(s"$dir/orders.parquet")
      .select(substring(col("o_orderpriority"), 1, 1).as("g"),
        expr("CAST(CAST(o_totalprice * 100 AS DECIMAL(18,0)) div 100 AS BIGINT)")
          .as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap

  private lazy val dailyCents: Seq[(String, Long)] =
    spark.read.parquet(s"$dir/orders.parquet")
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
        .as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)

  test("q_levene: W equals the ANOVA F on exact |x - group median|") {
    val devs = dollarsByG.map { case (g, xs) =>
      val sorted = xs.sorted
      // lower median: first value with 2·cum >= n
      var cum = 0L
      val med = sorted.find { v => cum += 1; 2 * cum >= xs.size }.get
      g -> xs.map(x => math.abs(x - med))
    }
    val stats = (1 to 5).map { i =>
      val v = devs.getOrElse(i.toString, Seq.empty)
      (v.size.toLong, v.sum, v.map(z => z * z).sum)
    }
    val n = stats.map(_._1).sum
    val k = stats.count(_._1 > 0).toLong
    val grand = stats.map(_._2).sum.toDouble / n
    val ssb = stats.map { case (ni, si, _) =>
      if (ni > 0) ni * (si.toDouble / ni - grand) * (si.toDouble / ni - grand)
      else 0.0
    }.foldLeft(0.0)(_ + _)
    val ssw = stats.map { case (ni, si, qi) =>
      if (ni > 0) qi.toDouble - si.toDouble * si / ni else 0.0
    }.foldLeft(0.0)(_ + _)
    val w = if (k > 1 && n > k && ssw > 0)
      (ssb / (k - 1)) / (ssw / (n - k)) else 0.0
    val got = SparkEntry.queries("q_levene")(spark, dir).collect().head
    assert(got.getLong(0) == n && got.getLong(1) == k)
    assert(math.abs(got.getDouble(2) - w) < 5e-7)
  }

  test("q_effect_sizes: 10 pairs, d replays, antisymmetry holds") {
    val m = dollarsByG.view.mapValues { xs =>
      (xs.size.toLong, xs.sum, xs.map(x => x * x).sum)
    }.toMap
    val got = SparkEntry.queries("q_effect_sizes")(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(got.size == 10)
    got.foreach { case ((ga, gb), (na, nb, d, g)) =>
      val (wna, sa, qa) = m(ga); val (wnb, sb, qb) = m(gb)
      assert(na == wna && nb == wnb)
      val va = qa.toDouble - sa.toDouble * sa / wna
      val vb = qb.toDouble - sb.toDouble * sb / wnb
      val sp = math.sqrt((va + vb) / (wna + wnb - 2.0))
      val wantD = (sa.toDouble / wna - sb.toDouble / wnb) / sp
      assert(math.abs(d - wantD) < 5e-7, s"pair $ga-$gb")
      val corr = 1.0 - 3.0 / (4.0 * (wna + wnb) - 9.0)
      assert(math.abs(g - wantD * corr) < 5e-7)
      assert(math.abs(g) <= math.abs(d) + 1e-9, "Hedges shrinks toward 0")
    }
  }

  test("q_bh_fdr: integer step-up replays on quantized tails") {
    // the operator's planted 5×-max outlier day (r10 vacuity fix)
    val cents = dailyCents :+ ("1990-01-01", dailyCents.map(_._2).max * 5)
    val n = cents.size.toLong
    val s = cents.map(_._2).sum
    val q = cents.map(t => BigInt(t._2) * t._2).sum
    val mean = s.toDouble / n
    val sd = math.sqrt((q.toDouble - s.toDouble * s / n) / (n - 1.0))
    def pPpm(z: Double): Long = {
      val az = math.abs(z)
      val t = 1.0 / (1.0 + 0.2316419 * az)
      val poly = 0.319381530 * t - 0.356563782 * t * t +
        1.781477937 * t * t * t - 1.821255978 * t * t * t * t +
        1.330274429 * t * t * t * t * t
      math.floor(2.0 * (math.exp(-az * az / 2.0) / math.sqrt(2.0 * math.Pi))
        * poly * 1e6).toLong
    }
    val ps = cents.map { case (d, x) =>
      val z = math.rint((x - mean) / sd * 1e6) / 1e6 // round 6 as shipped
      (d, pPpm(z))
    }.sortBy(t => (t._2, t._1)).zipWithIndex
    val kStar = ps.collect {
      case ((_, p), i) if p * n <= (i + 1).toLong * 50000L => (i + 1).toLong
    }.foldLeft(0L)(math.max)
    val got = SparkEntry.queries("q_bh_fdr")(spark, dir).collect().head
    assert(got.getLong(0) == n)
    assert(got.getLong(1) == kStar)
    assert(got.getLong(2) == ps.map(_._1._2).min)
    // the step-up rule must discover the planted outlier day
    assert(got.getLong(1) >= 1L, "planted outlier day not discovered")
  }

  test("q_qq_normal: exact rank deciles, gaps consistent") {
    val n = dailyCents.size.toLong
    val sorted = dailyCents.sortBy(t => (t._2, t._1)).map(_._2)
    val got = SparkEntry.queries("q_qq_normal")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4))).sortBy(_._1)
    assert(got.map(_._1).toSeq == (1L to 9L))
    got.foreach { case (dec, cents, zE, zT, gap) =>
      val rk = (dec * n + 9) / 10
      assert(cents == sorted((rk - 1).toInt), s"decile $dec")
      assert(math.abs(gap - (zE - zT)) < 2e-6)
    }
    // median decile sits near the distribution center
    assert(math.abs(got(4)._3) < 1.0)
    assert(got(4)._4 == 0.0)
  }

  test("q_jarque_bera + q_durbin_watson replay from exact moments") {
    // JB on truncated k$ units, matching the shipped quantization
    val kd = dailyCents.map(_._2 / 100000L)
    val n = kd.size.toLong
    val s1 = kd.sum
    val s2 = kd.map(x => BigInt(x) * x).sum
    val s3 = kd.map(x => BigInt(x) * x * x).sum
    val s4 = kd.map(x => BigInt(x) * x * x * x).sum
    val mu = s1.toDouble / n
    val m2 = s2.toDouble / n - mu * mu
    val m3 = s3.toDouble / n - 3.0 * mu * (s2.toDouble / n) + 2.0 * mu * mu * mu
    val m4 = s4.toDouble / n - 4.0 * mu * (s3.toDouble / n) +
      6.0 * mu * mu * (s2.toDouble / n) - 3.0 * mu * mu * mu * mu
    val skew = m3 / (m2 * math.sqrt(m2))
    val kurt = m4 / (m2 * m2) - 3.0
    val jb = n * (skew * skew / 6.0 + kurt * kurt / 24.0)
    val gotJb = SparkEntry.queries("q_jarque_bera")(spark, dir).collect().head
    assert(gotJb.getLong(0) == n)
    assert(math.abs(gotJb.getDouble(1) - skew) < 5e-7)
    assert(math.abs(gotJb.getDouble(2) - kurt) < 5e-7)
    assert(math.abs(gotJb.getDouble(3) - jb) < 1e-4)
    // DW on dollar units
    val xs = dailyCents.map(_._2 / 100L)
    val ds = xs.sliding(2).map(p => p(1) - p(0)).toSeq
    val sS = xs.sum; val qS = xs.map(x => BigInt(x) * x).sum
    val dd = ds.map(d => BigInt(d) * d).sum
    val dw = xs.size * dd.toDouble /
      (xs.size * qS.toDouble - sS.toDouble * sS.toDouble)
    val gotDw = SparkEntry.queries("q_durbin_watson")(spark, dir).collect().head
    assert(gotDw.getLong(0) == xs.size.toLong)
    assert(math.abs(gotDw.getDouble(1) - dw) < 5e-7)
    // independent-ish daily totals: DW should sit near 2
    assert(gotDw.getDouble(1) > 0.5 && gotDw.getDouble(1) < 3.5)
  }
}
