package graft

import org.apache.spark.sql.functions._

/** Ops 325-328 (round-8 widening, spectral/resampling series stats):
  * PACF, periodogram, permutation test, overdispersion — driver replays
  * at sf0.001 with BigInt folds over the same dense daily grid. */
class SpectralResamplingOpsSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"

  /** The shared daily-GMV grid, rebuilt driver-side: day index from
    * 1992-01-01, k$ units, dense zeros. */
  private def grid(): Seq[(Long, Long)] = {
    val byDay = spark.read.parquet(s"$dir/orders.parquet")
      .select(datediff(to_date(col("o_orderdate")),
        lit("1992-01-01").cast("date")).cast("long").as("d"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(v => v.map(_._2).sum / 100000L).toMap
    val lo = byDay.keys.min; val hi = byDay.keys.max
    (lo to hi).map(d => (d, byDay.getOrElse(d, 0L)))
  }

  test("q_pacf: Durbin-Levinson on exact ppm autocorrelations replays") {
    val g = grid().map(_._2)
    val n = g.size.toLong
    val s = g.sum
    def c2(k: Int): BigInt = {
      val pairs = g.zip(g.drop(k))
      BigInt(n) * n * pairs.map { case (a, b) => a * b }.sum -
        BigInt(n) * s * (pairs.map(_._1).sum + pairs.map(_._2).sum) +
        BigInt(n - k) * s * s
    }
    val c20 = BigInt(n) * n * g.map(x => x * x).sum - BigInt(n) * s * s
    def sdiv(num: BigInt, den: BigInt): Long =
      (if (num >= 0) num * 1000000 / den else -((-num) * 1000000 / den)).toLong
    val r1 = sdiv(c2(1), c20); val r2 = sdiv(c2(2), c20)
    val r3 = sdiv(c2(3), c20)
    val row = SparkEntry.queries("q_pacf")(spark, dir).collect()(0)
    assert(row.getLong(0) == n)
    assert((row.getLong(1), row.getLong(2), row.getLong(3)) == ((r1, r2, r3)))
    // Durbin-Levinson doubles
    val d1 = r1 / 1e6; val d2 = r2 / 1e6; val d3 = r3 / 1e6
    val phi22 = (d2 - d1 * d1) / (1.0 - d1 * d1)
    val phi21 = d1 * (1.0 - phi22)
    val phi33 = (d3 - phi21 * d2 - phi22 * d1) /
      (1.0 - phi21 * d1 - phi22 * d2)
    assert(math.abs(row.getDouble(4) - d1) < 1e-6)
    assert(math.abs(row.getDouble(5) - phi22) < 1e-6)
    assert(math.abs(row.getDouble(6) - phi33) < 1e-6)
  }

  test("q_periodogram: literal-table harmonic fold replays; share bounded") {
    val g = grid()
    val n = g.size.toLong
    val s = g.map(_._2).sum
    val sxx = g.map(t => t._2 * t._2).sum
    val c20 = BigInt(n) * n * sxx - BigInt(n) * s * s
    val want = Seq(7, 30).map { p =>
      val a = g.map { case (d, x) =>
        (BigInt(n) * x - s) *
          Math.round(Math.cos(2 * Math.PI * (d % p) / p) * 1e6)
      }.sum
      val b = g.map { case (d, x) =>
        (BigInt(n) * x - s) *
          Math.round(Math.sin(2 * Math.PI * (d % p) / p) * 1e6)
      }.sum
      val aa = a.abs / (n * 1000000L); val bb = b.abs / (n * 1000000L)
      val c0d = c20 / (BigInt(n) * n)
      val den = (if (c0d == 0) BigInt(1) else c0d) * n
      (p.toLong, n, ((aa * aa + bb * bb) * 2000000 / den).toLong)
    }
    val got = SparkEntry.queries("q_periodogram")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
    got.foreach { case (_, _, sh) => assert(sh >= 0 && sh <= 1000000) }
  }

  test("q_permutation_test: hash relabels replay; p in (0, 1]") {
    val g = grid()
    val M = BigInt(operators.TextAnalysis.FingerprintMod)
    val A = BigInt(6364136223846793005L)
    def sdiv(num: BigInt, den: BigInt): Long =
      (if (num >= 0) num * 1000000 / den else -((-num) * 1000000 / den)).toLong
    def stat(lab: Long => Boolean): Option[Long] = {
      val (we, wd) = g.partition(t => lab(t._1))
      if (we.isEmpty || wd.isEmpty) None
      else Some(sdiv(
        BigInt(we.map(_._2).sum) * wd.size - BigInt(wd.map(_._2).sum) * we.size,
        BigInt(we.size) * wd.size))
    }
    val obs = stat(d => (d + 2) % 7 >= 5).get
    val stats = (1 to 200).flatMap { b =>
      stat(d => ((BigInt(d * 211 + b) * A).mod(M) % 7).toInt < 2)
    }
    val nExtreme = stats.count(st => st.abs >= obs.abs).toLong
    val row = SparkEntry.queries("q_permutation_test")(spark, dir).collect()(0)
    assert(row.getLong(0) == g.size.toLong)
    assert(row.getLong(1) == obs)
    assert(row.getLong(2) == stats.size.toLong)
    assert(row.getLong(3) == nExtreme)
    assert(row.getLong(4) == (1 + nExtreme) * 1000000 / (stats.size + 1))
    assert(row.getLong(4) > 0 && row.getLong(4) <= 1000000)
  }

  test("q_overdispersion: dispersion index replays per type") {
    val ev = eventsTable(dir)
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val want = ev.groupBy(_._1).map { case (t, rs) =>
      val byDay = rs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val lo = byDay.keys.min; val hi = byDay.keys.max
      val cnts = (lo to hi).map(d => byDay.getOrElse(d, 0L))
      val n = cnts.size.toLong; val s = cnts.sum
      val sxx = cnts.map(c => c * c).sum
      val disp = ((BigInt(n) * sxx - BigInt(s) * s) * 1000000 /
        (BigInt(n - 1) * s)).toLong
      (t, n, s, s * 1000000 / n, disp)
    }.toSet
    val got = SparkEntry.queries("q_overdispersion")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == want)
    // daily arrivals of a uniform synthetic stream sit near Poisson:
    // D within a broad [0.2, 5] band (the flag band, not a tight bound)
    got.foreach { case (t, _, _, _, d) =>
      assert(d > 200000L && d < 5000000L, s"type $t dispersion $d")
    }
  }
}
