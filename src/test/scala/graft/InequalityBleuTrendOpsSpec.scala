package graft

import org.apache.spark.sql.functions.expr

/** q_theil_index, q_bleu, q_type_trend: driver-side replays of the
  * round-10 inequality-decomposition / generation-eval / monitoring
  * surface. */
class InequalityBleuTrendOpsSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"
  private def q(key: String) = SparkEntry.queries(key)(spark, dir)

  private def lnQ6(x: Long): Long = math.floor(math.log(x.toDouble) * 1e6).toLong
  private def sdivRaw(a: BigInt, b: BigInt): BigInt =
    if (a >= 0) a / b else -((-a) / b)

  test("Theil total/between/within replay; decomposition ~holds") {
    val rows = spark.sql(s"""
      SELECT CAST(c.c_nationkey AS LONG),
             CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS LONG)
      FROM parquet.`$dir/orders.parquet` o
      JOIN parquet.`$dir/customer.parquet` c ON o.o_custkey = c.c_custkey""")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val per = rows.groupBy(_._1).toSeq.map { case (_, xs) =>
      val n = BigInt(xs.length)
      val sx = xs.map(x => BigInt(x._2)).sum
      val sxl = xs.map(x => BigInt(x._2) * lnQ6(x._2)).sum
      val mu = sx / n
      (n, sx, sxl, mu, sdivRaw(sxl - BigInt(lnQ6(mu.toLong)) * sx, n * mu))
    }
    val nn = per.map(_._1).sum
    val tsx = per.map(_._2).sum
    val tsxl = per.map(_._3).sum
    val tmu = tsx / nn
    val total = sdivRaw(tsxl - BigInt(lnQ6(tmu.toLong)) * tsx, nn * tmu)
    val between = sdivRaw(
      per.map(p => p._2 * lnQ6(p._4.toLong)).sum -
        BigInt(lnQ6(tmu.toLong)) * tsx, tsx)
    val within = sdivRaw(per.map(p => p._2 * p._5).sum, tsx)
    val r = q("q_theil_index").collect().head
    assert(r.getLong(0) == nn.toLong)
    assert(r.getLong(1) == total.toLong, "total")
    assert(r.getLong(2) == between.toLong, "between")
    assert(r.getLong(3) == within.toLong, "within")
    // decomposability (up to quantization): T ≈ T_B + T_W
    assert(math.abs(r.getLong(1) - (r.getLong(2) + r.getLong(3))) < 100L,
      s"decomposition broken: ${r.getLong(1)} vs ${r.getLong(2)} + ${r.getLong(3)}")
    assert(r.getLong(1) > 0L, "zero inequality — vacuous fixture")
  }

  test("BLEU per-source means replay from definitional clipped counts") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id", "source", "lower(text) AS tx").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val byId = docs.map(d => d._1 -> d).toMap
    def toks(s: String): Array[String] = s.trim.split("\\s+")
    def grams(ts: Array[String], n: Int): Seq[String] =
      if (ts.length < n) Seq(ts.mkString(" "))
      else ts.sliding(n).map(_.mkString(" ")).toSeq
    val perPair = docs.flatMap { h =>
      byId.get(h._1 + 20).filter(_._2 == h._2).map { r =>
        val (ht, rt) = (toks(h._3), toks(r._3))
        val slp = (1 to 4).map { n =>
          val hc = grams(ht, n).groupBy(identity).map { case (g, xs) => (g, xs.size.toLong) }
          val rc = grams(rt, n).groupBy(identity).map { case (g, xs) => (g, xs.size.toLong) }
          val tot = hc.values.sum
          val clip = hc.map { case (g, c) => math.min(c, rc.getOrElse(g, 0L)) }.sum
          lnQ6((BigInt(clip) * BigInt("1000000000000") / tot).max(BigInt(1)).toLong) - 27631021L
        }.sum
        val bp = math.min(0L, 1000000L - rt.length.toLong * 1000000L / ht.length)
        (h._2, sdivRaw(BigInt(slp) + 4 * BigInt(bp), 4))
      }
    }
    val want = perPair.groupBy(_._1).map { case (src, xs) =>
      (src, xs.length.toLong,
        sdivRaw(xs.map(_._2).sum, BigInt(xs.length)).toLong)
    }.toSet
    val got = q("q_bleu").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    // log-BLEU strictly negative (imperfect overlap) and not constant
    assert(got.forall(_._3 < 0L))
    assert(got.map(_._3).size > 1, "all sources identical — vacuous")
  }

  test("bleu_clip_counts: positions, truncated grams, multiset clipping") {
    import spark.implicits._
    val rows = Seq(("a a b a", "a b c"), ("x", "y z"), ("", "a"))
      .toDF("h", "r")
      .select(graft.functions.NativeText.bleu_clip_counts(
        expr("split(trim(h), '\\\\s+')"), expr("split(trim(r), '\\\\s+')")).as("cc"))
      .collect().map(_.getSeq[Long](0))
    // hyp [a,a,b,a] vs ref [a,b,c]: n=1 tot4 clip min(3,1)+min(1,1)=2;
    // n=2 {a a, a b, b a} vs {a b, b c} → 1; n=3 2 grams vs "a b c" → 0;
    // n=4 one truncated gram each ("a a b a" vs "a b c") → 0
    assert(rows(0) == Seq(4L, 2L, 3L, 1L, 2L, 0L, 1L, 0L))
    // shorter-than-n sides: every n has exactly ONE (truncated) gram
    assert(rows(1) == Seq(1L, 0L, 1L, 0L, 1L, 0L, 1L, 0L))
    // empty text tokenizes to [""] (the split(trim) convention)
    assert(rows(2) == Seq(1L, 0L, 1L, 0L, 1L, 0L, 1L, 0L))
  }

  test("type-trend slopes replay on the shared dense-grid moments") {
    val daily = eventsTable(dir)
      .selectExpr("event_type", "CAST(ts AS DATE) AS d").collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate))
      .groupBy(identity).map { case (k, v) => (k._1, k._2, v.size.toLong) }
      .toSeq
    val days = daily.map(_._2).distinct.sorted
    val d0 = days.head
    val x = days.map(d =>
      d -> java.time.temporal.ChronoUnit.DAYS.between(d0, d)).toMap
    val types = daily.map(_._1).distinct
    val cell = daily.map(r => ((r._1, r._2), r._3)).toMap
    def sdiv(a: BigInt, b: BigInt): BigInt =
      if (a >= 0) a * 1000000 / b else -((-a) * 1000000 / b)
    val want = types.map { ty =>
      val cells = days.map(d => (BigInt(x(d)), BigInt(cell.getOrElse((ty, d), 0L))))
      val nd = BigInt(cells.length)
      val sx = cells.map(_._1).sum; val sxx = cells.map(c => c._1 * c._1).sum
      val sy = cells.map(_._2).sum; val sxy = cells.map(c => c._1 * c._2).sum
      (ty, sy.toLong, sdiv(nd * sxy - sx * sy, nd * sxx - sx * sx).toLong)
    }.toSet
    val got = q("q_type_trend").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    assert(got.map(_._3).size > 1, "all slopes equal — vacuous")
  }
}
