package graft

import org.apache.spark.sql.functions._

/** Ops 329-332 (round-8 widening, schema forensics + causal inference):
  * key discovery, Tukey HSD, diff-in-diff, IV Wald — driver replays at
  * sf0.001. */
class CausalForensicsOpsSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"

  test("q_key_discovery: uniqueness replays; event_id is a key") {
    val got = SparkEntry.queries("q_key_discovery")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSeq
    assert(got.size == 6)
    val byCombo = got.map(t => t._1 -> t).toMap
    // event_id is the PK by construction; event_type never is
    assert(byCombo("event_id")._5, "event_id must be a key")
    assert(!byCombo("event_type")._5)
    // a superset combo is at least as unique as its subset
    assert(byCombo("user_id,ts")._3 >= byCombo("user_id")._3)
    assert(byCombo("user_id,event_type,ts")._3 >= byCombo("user_id,ts")._3)
    got.foreach { case (c, n, nd, ppm, isKey) =>
      assert(nd <= n && ppm == nd * 1000000 / n && isKey == (nd == n), c)
    }
  }

  test("q_tukey_hsd: q stats replay against a driver-side pooled fold") {
    // the operator's planted +5e6-cent shift on group 5 (r10 vacuity fix)
    val xs = spark.read.parquet(s"$dir/orders.parquet")
      .select(substring(col("o_orderpriority"), 1, 1),
        expr("CAST(CAST(o_totalprice * 100 AS DECIMAL(18,0)) div 100 AS BIGINT)"))
      .collect().map(r => (r.getString(0),
        r.getLong(1) + (if (r.getString(0) == "5") 5000000L else 0L)))
    val by = xs.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val n = xs.length.toLong
    val k = 5L
    val ssw = (1 to 5).map { i =>
      val g = by(i.toString)
      g.map(x => x.toDouble * x).sum -
        g.sum.toDouble * g.sum / g.size
    }.sum
    val msw = ssw / (n - k).toDouble
    val got = SparkEntry.queries("q_tukey_hsd")(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5),
          r.getBoolean(6)))).toMap
    assert(got.size == 10)
    for (i <- 1 to 5; j <- (i + 1) to 5) {
      val (na, nb, diff, q, sig) = got((i.toString, j.toString))
      val ga = by(i.toString); val gb = by(j.toString)
      assert(na == ga.size.toLong && nb == gb.size.toLong)
      val wantDiff = ga.sum.toDouble / ga.size - gb.sum.toDouble / gb.size
      assert(math.abs(diff - wantDiff) < 1e-5)
      val wantQ = wantDiff /
        math.sqrt(msw * 0.5 * (1.0 / ga.size + 1.0 / gb.size))
      assert(math.abs(q - wantQ) < 1e-5, s"pair $i-$j: $q vs $wantQ")
      assert(sig == (math.abs(q) > 3.858))
    }
    // the four group-5 contrasts carry the planted effect and must flag
    assert((1 to 4).forall(i => got((i.toString, "5"))._5),
      "planted group-5 shift not flagged by HSD")
  }

  test("q_did: cell means replay; DID is the trend difference") {
    val rows = {
      val cust = spark.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey"), col("c_mktsegment"))
      spark.read.parquet(s"$dir/orders.parquet")
        .join(cust, col("o_custkey") === col("c_custkey"))
        .select((col("c_mktsegment") === "BUILDING").cast("long"),
          datediff(to_date(col("o_orderdate")),
            lit("1992-01-01").cast("date")).cast("long"),
          (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    }
    val lo = rows.map(_._2).min; val hi = rows.map(_._2).max
    val cut = lo + (hi - lo) / 2
    def cell(t: Long, post: Boolean): (Long, BigInt) = {
      val c = rows.filter(r => r._1 == t && (r._2 >= cut) == post)
      (c.size.toLong, BigInt(c.map(_._3).sum))
    }
    val (nt1, st1) = cell(1, post = true); val (nt0, st0) = cell(1, post = false)
    val (nc1, sc1) = cell(0, post = true); val (nc0, sc0) = cell(0, post = false)
    val tt = (st1 * 1000000 / nt1 - st0 * 1000000 / nt0).toLong
    val ct = (sc1 * 1000000 / nc1 - sc0 * 1000000 / nc0).toLong
    val r = SparkEntry.queries("q_did")(spark, dir).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((nt1, nt0, nc1, nc0)))
    assert(r.getLong(4) == tt && r.getLong(5) == ct)
    assert(r.getLong(6) == tt - ct)
    // every cell must be populated (the midpoint cut guarantees it on
    // any data window — the bug the fixed-literal cut had)
    assert(Seq(nt1, nt0, nc1, nc0).forall(_ > 0))
  }

  test("q_iv_wald: covariance ratios replay; weak instrument is visible") {
    val rows = {
      val part = spark.read.parquet(s"$dir/part.parquet")
        .select(col("p_partkey"), col("p_size"))
      spark.read.parquet(s"$dir/lineitem.parquet")
        .join(part, col("l_partkey") === col("p_partkey"))
        .select((col("l_extendedprice").cast("decimal(18,2)") * 100)
          .cast("long"),
          col("l_quantity").cast("long"), col("p_size").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    }
    val n = rows.length.toLong
    val sy = rows.map(_._1).sum; val sx = rows.map(_._2).sum
    val sz = rows.map(_._3).sum
    val syz = rows.map(r => r._1 * r._3).sum
    val sxz = rows.map(r => r._2 * r._3).sum
    val sxy = rows.map(r => BigInt(r._1) * r._2).sum
    val sxx = rows.map(r => r._2 * r._2).sum
    def sdiv(num: BigInt, den: BigInt): Long =
      (if (num.signum * den.signum >= 0) num.abs * 1000000 / den.abs
       else -(num.abs * 1000000 / den.abs)).toLong
    val covYZ = BigInt(n) * syz - BigInt(sy) * sz
    val covXZ = BigInt(n) * sxz - BigInt(sx) * sz
    val covXY = BigInt(n) * sxy - BigInt(sy) * sx
    val varX = BigInt(n) * sxx - BigInt(sx) * sx
    val r = SparkEntry.queries("q_iv_wald")(spark, dir).collect()(0)
    assert(r.getLong(0) == n)
    assert(r.getLong(1) == sdiv(covYZ, covXZ))
    assert(r.getLong(2) == sdiv(covXY, varX))
    // the synthetic instrument is weak BY DESIGN (size independent of
    // quantity): the first-stage gate must say so
    assert(math.abs(r.getDouble(3)) < 0.1,
      s"first-stage corr ${r.getDouble(3)} should be near zero")
  }
}
