package graft

import java.math.{BigDecimal => JBD, RoundingMode}

/** q_agg_reversal, q_mediation, q_stl_strength, q_page_hinkley:
  * driver-side exact replays of the round-11 analytics batch, plus
  * fires-on-this-corpus assertions for the two detectors (the vacuity
  * discipline: a detector that can never alarm measures nothing).
  */
class Round11OpsSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"
  private val dir01 = "/root/testdata/sf0.01"
  private def q(key: String, d: String = dir) = SparkEntry.queries(key)(spark, d)

  private def cents(v: Double, scale: Int): Long =
    JBD.valueOf(v).setScale(scale, RoundingMode.HALF_UP)
      .movePointRight(scale).longValueExact()

  test("q_agg_reversal: integer cross-multiplied replay, zero division") {
    val rows = spark.read.parquet(s"$dir/orders.parquet")
      .selectExpr("date_format(o_orderdate, 'yyyy-MM') AS m",
        "substring(o_orderpriority, 1, 1) IN ('1','2') AS hi",
        "o_orderstatus = 'F' AS f")
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getBoolean(2)))
    val strata = rows.groupBy(_._1).map { case (m, es) =>
      (m, es.count(_._2).toLong, es.count(e => e._2 && e._3).toLong,
        es.count(!_._2).toLong, es.count(e => !e._2 && e._3).toLong)
    }.toSeq
    val aggDir = {
      val (fh, nl, fl, nh) = (strata.map(s => BigInt(s._3)).sum,
        strata.map(s => BigInt(s._4)).sum, strata.map(s => BigInt(s._5)).sum,
        strata.map(s => BigInt(s._2)).sum)
      (fh * nl - fl * nh).signum.toLong
    }
    val expect = strata.map { case (m, nh, fh, nl, fl) =>
      val sd = (BigInt(fh) * nl - BigInt(fl) * nh).signum.toLong
      (m, nh, fh, nl, fl, sd, sd * aggDir < 0)
    }.toSet
    val got = q("q_agg_reversal").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getBoolean(6))).toSet
    assert(got == expect)
    // the detector demonstrably fires: at sf0.01 reversed strata exist
    assert(q("q_agg_reversal", dir01).where("reversed").count() > 0,
      "no reversed stratum at sf0.01 — dead detector")
  }

  test("q_mediation: path coefficients from exact moments; a*b tracks c - c'") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .selectExpr("l_extendedprice", "l_returnflag = 'R' AS t", "l_discount")
      .collect()
      .map(r => (cents(r.getDouble(0), 2),
        if (r.getBoolean(1)) 1L else 0L, cents(r.getDouble(2), 2)))
    val n = li.length.toLong
    def bsum(f: ((Long, Long, Long)) => BigInt): BigInt = li.map(f).sum
    val (sx1, sx2, sy) = (bsum(e => BigInt(e._2)), bsum(e => BigInt(e._3)),
      bsum(e => BigInt(e._1)))
    val sx11 = bsum(e => BigInt(e._2) * e._2)
    val sx22 = bsum(e => BigInt(e._3) * e._3)
    val sx12 = bsum(e => BigInt(e._2) * e._3)
    val sx1y = bsum(e => BigInt(e._2) * e._1)
    val sx2y = bsum(e => BigInt(e._3) * e._1)
    // the query's fixed-order double tree over the exact moments
    def d(b: BigInt): Double = b.toDouble
    val nn = n.toDouble
    val c11 = nn * d(sx11) - d(sx1) * d(sx1)
    val c22 = nn * d(sx22) - d(sx2) * d(sx2)
    val c12 = nn * d(sx12) - d(sx1) * d(sx2)
    val c1y = nn * d(sx1y) - d(sx1) * d(sy)
    val c2y = nn * d(sx2y) - d(sx2) * d(sy)
    val det = c11 * c22 - c12 * c12
    val aRaw = if (c11 != 0.0) c12 / c11 else 0.0
    val cRaw = if (c11 != 0.0) c1y / c11 else 0.0
    val b1Raw = if (det != 0.0) (c22 * c1y - c12 * c2y) / det else 0.0
    val b2Raw = if (det != 0.0) (c11 * c2y - c12 * c1y) / det else 0.0
    def r6(x: Double): Double =
      JBD.valueOf(x).setScale(6, RoundingMode.HALF_UP).doubleValue()
    val r = q("q_mediation").collect().head
    assert(r.getLong(0) == n)
    assert(r.getDouble(1) == r6(aRaw), "a (T->M slope)")
    assert(r.getDouble(2) == r6(b2Raw), "b (M->Y|T)")
    assert(r.getDouble(3) == r6(b1Raw), "direct effect")
    assert(r.getDouble(4) == r6(cRaw), "total effect")
    assert(r.getDouble(5) == r6(aRaw * b2Raw), "ACME")
    assert(r.getDouble(6) ==
      r6(if (cRaw != 0.0) aRaw * b2Raw / cRaw else 0.0), "prop mediated")
    // OLS identity: total = direct + ACME (exact in exact arithmetic,
    // here within double noise of the three separate solves)
    assert(math.abs(r.getDouble(4) - (r.getDouble(3) + r.getDouble(5)))
      <= 1e-3 * math.max(1.0, math.abs(r.getDouble(4))),
      "c = c' + a*b identity broken")
  }

  test("q_stl_strength: BigInt replay of the variance-explained ratios") {
    val months = spark.read.parquet(s"$dir/orders.parquet")
      .selectExpr("date_format(o_orderdate, 'yyyy-MM') AS m", "o_totalprice")
      .collect().map(r => (r.getString(0), BigInt(cents(r.getDouble(1), 2))))
      .groupBy(_._1).map { case (m, es) => (m, es.map(_._2).sum) }
      .toSeq.sortBy(_._1)
    val rev = months.map(_._2)
    val trend = months.indices.map { i =>
      if (i >= 6 && i + 6 < months.length)
        Some((2 * rev.slice(i - 6, i + 7).sum * 1000000 + 13) / 26)
      else None
    }
    val det = months.indices.map(i => trend(i).map(rev(i) * 1000000 - _))
    val seas = months.indices.filter(det(_).isDefined)
      .groupBy(i => months(i)._1.substring(5, 7))
      .map { case (moy, is) =>
        val sd = is.map(det(_).get).sum
        val k = BigInt(is.size)
        // sign-split round-nearest: off-season sums are negative
        moy -> (if (sd >= 0) (2 * sd + k) / (2 * k)
                else -((2 * -sd + k) / (2 * k)))
      }
    def sdivC(x: BigInt): BigInt =
      if (x >= 0) x / 1000000 else -((-x) / 1000000)
    val comps = months.indices.filter(det(_).isDefined).map { i =>
      val s = seas(months(i)._1.substring(5, 7))
      (sdivC(det(i).get - s), sdivC(det(i).get),
        sdivC(rev(i) * 1000000 - s))
    }
    val n0 = BigInt(comps.length)
    def varNum(xs: Seq[BigInt]): BigInt =
      n0 * xs.map(x => x * x).sum - xs.sum * xs.sum
    val (vR, vSR, vTR) = (varNum(comps.map(_._1)), varNum(comps.map(_._2)),
      varNum(comps.map(_._3)))
    def strength(vx: BigInt): Long =
      if (vx > 0) (BigInt(1000000) - (vR * 1000000 / vx)).max(0).toLong
      else 0L
    val r = q("q_stl_strength").collect().head
    assert(r.getLong(0) == comps.length.toLong)
    assert(r.getLong(1) == strength(vSR), "seasonal strength")
    assert(r.getLong(2) == strength(vTR), "trend strength")
    assert(r.getLong(1) >= 0 && r.getLong(1) <= 1000000L)
    assert(r.getLong(2) >= 0 && r.getLong(2) <= 1000000L)
  }

  test("IvfIndex.subdivide: content-keyed split — planted exact duplicates co-bucket at 80k vectors") {
    import org.apache.spark.sql.functions._
    // 70k distinct embeddings in one mega-cell; every 7th ALSO planted as
    // an exact duplicate under vec_id + 1e7 (the q_semdedup scheme:
    // DIFFERENT id, SAME embedding) → 80k rows, well past the 4096 cap
    // at every prior test SF. The split key is the embedding hash, so a
    // duplicate pair MUST land in the same sub-cell — the property the
    // semDedup τ gate and kNN recall ride on (an id-keyed split scatters
    // a pair with probability (nsub-1)/nsub and silently un-finds it).
    val base = spark.range(70000).select(col("id").as("vec_id"), lit(7).as("cid"),
      array((col("id") * 2 + 1).cast("double") / 1000.0,
        (col("id") % 997).cast("double") / 10.0).as("embedding"))
    val dups = base.filter(col("vec_id") % 7 === 3)
      .select((col("vec_id") + 10000000L).as("vec_id"), col("cid"), col("embedding"))
    val small = spark.range(100).select((col("id") + 20000000L).as("vec_id"),
      lit(3).as("cid"), array(col("id").cast("double"),
        col("id").cast("double")).as("embedding"))
    val sub = operators.IvfIndex
      .subdivide(base.unionAll(dups).unionAll(small), "embedding", 4096L)
      .select("cid", "vec_id", "sub").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val mega = sub.filter(_._1 == 7)
    val nsub = (80000 + 4095) / 4096 // = 20
    assert(mega.map(_._3).distinct.sorted.toSeq == (0L until nsub).toSeq)
    // every planted pair co-buckets — duplicates always meet the pair scan
    val byId = mega.map(t => t._2 -> t._3).toMap
    val pairs = mega.filter(_._2 >= 10000000L)
    assert(pairs.length == 10000)
    assert(pairs.forall(p => byId(p._2) == byId(p._2 - 10000000L)),
      "an exact duplicate landed in a different sub-cell than its twin")
    // hash balance: every bucket well under 2x the uniform share, so the
    // pair bound that makes the scan linear (O(target) per vector) holds
    val sizes = mega.groupBy(_._3).view.mapValues(_.length).values
    assert(sizes.forall(_ < 2 * 4096), s"unbalanced sub-cells: max=${sizes.max}")
    // small cell: single sub = 0 — subdivision is a no-op
    assert(sub.filter(_._1 == 3).forall(_._3 == 0L))
  }

  test("q_lof: BigInt replay from the gated kNN graph edges") {
    val edges = q("q_knn_graph").collect()
      .map(r => (r.getLong(0), r.getLong(2),
        1000000L - math.round(r.getDouble(3) * 1000000)))
    val kdist = edges.groupBy(_._1).map { case (v, es) =>
      v -> es.map(_._3).max }
    val reach = edges.map { case (p, o, d) => (p, math.max(d, kdist(o))) }
    val lrd = reach.groupBy(_._1).map { case (p, rs) =>
      p -> (BigInt(rs.length) * BigInt("1000000000000") /
        BigInt(rs.map(_._2).sum).max(1), rs.length.toLong)
    }
    val expect = edges.groupBy(_._1).map { case (p, es) =>
      val slo = es.map(e => lrd(e._2)._1).sum
      val (own, k) = lrd(p)
      (p, k, own.toLong,
        ((slo * 1000000) / (own * k).max(1)).toLong)
    }.toSet
    val got = q("q_lof").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expect)
    // density scoring has bite: inliers sit near 1e6 ppm, and the
    // score set is not degenerate
    assert(got.map(_._4).size > 1, "all LOF scores identical")
  }

  test("q_gearys_c: BigInt replay over the co-purchase edge set") {
    val it = spark.read.parquet(s"$dir/lineitem.parquet")
      .selectExpr("l_orderkey AS ok", "l_partkey AS pk").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val co = scala.collection.mutable.Map.empty[(Long, Long), Int]
    it.groupBy(_._1).values.foreach { rows =>
      val pks = rows.map(_._2).sorted
      for (i <- pks.indices; j <- (i + 1) until pks.length) {
        val e = (pks(i), pks(j))
        co(e) = co.getOrElse(e, 0) + 1
      }
    }
    // NB: collect-to-pairs on a Map would rebuild a MAP and collapse
    // edges sharing a left endpoint — filter + keys keeps the full set
    val edges = co.filter(_._2 >= 2).keys.toSeq
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val price = spark.read.parquet(s"$dir/part.parquet")
      .selectExpr("p_partkey", "p_retailprice").collect()
      .map(r => r.getLong(0) -> BigInt(cents(r.getDouble(1), 2))).toMap
    val n = BigInt(nodes.length)
    val sAll = nodes.map(price).sum
    val z = nodes.map(v => v -> (price(v) * n - sAll)).toMap
    val sz2 = z.values.map(x => x * x).sum
    val sd2 = edges.map { case (a, b) =>
      val d = z(a) - z(b); d * d }.sum
    val e = BigInt(edges.length)
    val expect = ((n - 1) * sd2 * 1000000 / (2 * e * sz2)).toLong
    val r = q("q_gearys_c").collect().head
    assert(r.getLong(0) == nodes.length.toLong)
    assert(r.getLong(1) == edges.length.toLong)
    assert(r.getLong(2) == expect, "geary_micro")
  }

  test("q_theil_u2: BigInt replay of the two naive SSEs") {
    val daily = eventsTable(dir)
      .selectExpr("date_format(ts, 'yyyy-MM-dd') AS day").collect()
      .map(_.getString(0)).groupBy(identity).map { case (d, xs) =>
        (d, BigInt(xs.length)) }.toSeq.sortBy(_._1).map(_._2)
    val rows = daily.indices.filter(_ >= 7).map { i =>
      val em = daily(i) - daily(i - 7)
      val en = daily(i) - daily(i - 1)
      (em * em, en * en)
    }
    val (sm, sn) = (rows.map(_._1).sum, rows.map(_._2).sum)
    val r = q("q_theil_u2").collect().head
    assert(r.getLong(0) == rows.length.toLong)
    assert(r.getLong(1) == (sm * 1000000 / sn.max(1)).toLong)
    assert(r.getLong(2) == math.floor(math.sqrt(
      (sm * BigInt("1000000000000") / sn.max(1)).toDouble)).toLong)
  }

  test("q_page_hinkley: BigInt scan replay; alarms fire at sf0.01") {
    val daily = eventsTable(dir)
      .selectExpr("date_format(ts, 'yyyy-MM-dd') AS day", "value")
      .collect().map(r => (r.getString(0), BigInt(cents(r.getDouble(1), 6))))
      .groupBy(_._1).map { case (d, es) =>
        val (s, n) = (es.map(_._2).sum, BigInt(es.size))
        (d, (2 * s + n) / (2 * n))
      }.toSeq.sortBy(_._1)
    val xs = daily.map(_._2)
    var cs = BigInt(0); var mt = BigInt(0); var mn = BigInt(0)
    val ph = xs.zipWithIndex.map { case (x, i) =>
      cs += x
      val pm = (2 * cs + BigInt(i + 1)) / (2 * BigInt(i + 1))
      mt += x - pm
      mn = if (i == 0) mt else mn.min(mt)
      (mt - mn).toLong
    }
    val v = (BigInt(xs.length) * xs.map(x => x * x).sum -
      xs.sum * xs.sum) / (BigInt(xs.length) * xs.length)
    val sigma = math.floor(math.sqrt(v.toDouble)).toLong
    val expect = daily.zip(ph).map { case ((d, x), p) =>
      (d, x.toLong, p, p > 3 * sigma)
    }.toSet
    val got = q("q_page_hinkley").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
    assert(got == expect)
    // PH must be able to alarm on this corpus (measured max ~6 sigma)
    assert(q("q_page_hinkley", dir01).where("alarmed").count() > 0,
      "no alarmed day at sf0.01 — dead detector")
  }
}
