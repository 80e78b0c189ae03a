package graft

import org.apache.spark.sql.functions._

/** Ops 306-309 (round-8 widening, series mining + diversity):
  * matrix profile, distinct-n, seasonal Mann–Kendall, Ljung–Box —
  * driver replays at sf0.001 with plain Scala collections. */
class SeriesMiningOpsSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"

  private lazy val dailyCents: Seq[(String, Long)] =
    spark.read.parquet(s"$dir/orders.parquet")
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
        .as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)

  test("q_matrix_profile: exact integer nearest-window replay") {
    val kd = dailyCents.map { case (d, x) => (d, x / 100000L) }
    val wins = (0 until kd.size - 6).map { i =>
      (i + 1L, kd(i)._1, (0 to 6).map(k => kd(i + k)._2))
    }
    val want = wins.map { case (pa, day, va) =>
      val best = wins.filter(w => math.abs(w._1 - pa) >= 4)
        .map { case (pb, _, vb) =>
          (va.zip(vb).map { case (p, q) => (p - q) * (p - q) }.sum, pb)
        }.min
      (pa, day, best._1, best._2)
    }.toSet
    val got = SparkEntry.queries("q_matrix_profile")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == want)
    assert(got.size == wins.size)
  }

  test("q_distinct_n: type/token counts and ppm replay per source") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("source"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val want = docs.groupBy(_._1).map { case (src, ds) =>
      val toks = ds.map(_._2.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq)
      val uni = toks.flatten
      val bi = toks.flatMap(ws => ws.sliding(2).filter(_.size == 2)
        .map(p => p(0) + " " + p(1)))
      val d1 = if (uni.nonEmpty) uni.distinct.size.toLong * 1000000L / uni.size else 0L
      val d2 = if (bi.nonEmpty) bi.distinct.size.toLong * 1000000L / bi.size else 0L
      (src, uni.size.toLong, uni.distinct.size.toLong,
        bi.size.toLong, bi.distinct.size.toLong, d1, d2)
    }.toSet
    val got = SparkEntry.queries("q_distinct_n")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got == want)
    // diversity is a ratio: every ppm <= 1e6
    assert(got.forall(t => t._6 <= 1000000L && t._7 <= 1000000L))
  }

  test("q_seasonal_mk: per-season S and variance combine replay") {
    val byMonth = dailyCents.groupBy(_._1.substring(5, 7))
    var sTot = 0L; var var18 = 0L; var nTot = 0L
    byMonth.values.foreach { ds =>
      val sorted = ds.sortBy(_._1).map(_._2)
      for (i <- sorted.indices; j <- (i + 1) until sorted.size)
        sTot += java.lang.Long.signum(sorted(j) - sorted(i))
      val nm = sorted.size.toLong
      val tm = sorted.groupBy(identity).values
        .map(g => { val t = g.size.toLong; t * (t - 1) * (2 * t + 5) }).sum
      var18 += nm * (nm - 1) * (2 * nm + 5) - tm
      nTot += nm
    }
    val z = if (var18 > 0 && sTot != 0)
      (sTot - (if (sTot > 0) 1 else -1)) / math.sqrt(var18 / 18.0) else 0.0
    val got = SparkEntry.queries("q_seasonal_mk")(spark, dir).collect().head
    assert(got.getLong(0) == nTot)
    assert(got.getLong(1) == sTot)
    assert(math.abs(got.getDouble(2) - z) < 5e-7)
  }

  test("q_ljung_box: r_k moments and Q replay; near-zero ACF here") {
    val kd = dailyCents.map(_._2 / 100000L)
    val n = kd.size
    val mu = kd.sum.toDouble / n
    val den = kd.map(x => x.toDouble * x).sum - n * mu * mu
    def r(k: Int): Double = {
      val a = (0 until n - k).map(t => kd(t) * kd(t + k)).sum.toDouble
      val b = (0 until n - k).map(kd).sum.toDouble
      val c = (k until n).map(kd).sum.toDouble
      val raw = (a - mu * (b + c) + (n - k) * mu * mu) / den
      math.rint(raw * 1e6) / 1e6 // shipped fold rounds each r_k
    }
    val q = n.toDouble * (n + 2.0) *
      (1 to 7).map(k => r(k) * r(k) / (n - k)).sum
    val got = SparkEntry.queries("q_ljung_box")(spark, dir).collect().head
    assert(got.getLong(0) == n.toLong)
    assert(math.abs(got.getDouble(1) - r(1)) < 2e-6)
    assert(math.abs(got.getDouble(2) - q) < 1e-3)
    // daily totals at this SF are near-independent: every |r_k| small
    assert(math.abs(got.getDouble(1)) < 0.5)
  }
}
