package graft

/** q_pca_deflate, q_beta_binomial, q_learned_index: driver-side
  * replays of the round-10 deflation / hierarchical-prior /
  * learned-index surface. */
class DeflatePriorIndexOpsSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"
  private def q(key: String) = SparkEntry.queries(key)(spark, dir)

  test("deflated second direction replays; near-orthogonal to first") {
    val xq = spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("embedding").collect()
      .map(_.getSeq[Float](0).map(e => math.floor(e.toDouble * 1000).toLong).toArray)
    def power(rows: Array[Array[Long]]): Array[Long] = {
      var v = Array.fill(64)(1000000L)
      for (_ <- 1 to 3) {
        val u = Array.fill(64)(BigInt(0))
        rows.foreach { x =>
          var sx = BigInt(0)
          for (i <- 0 until 64) sx += BigInt(x(i)) * v(i)
          for (i <- 0 until 64) u(i) += BigInt(x(i)) * sx
        }
        val m = u.map(_.abs).max
        v = u.map(c => (c * 1000000 / m).toLong)
      }
      v
    }
    val v1 = power(xq)
    val d = v1.map(c => BigInt(c) * c).sum
    def sdivRaw(a: BigInt, b: BigInt): BigInt =
      if (a >= 0) a / b else -((-a) / b)
    val resid = xq.map { x =>
      val s = (0 until 64).map(i => BigInt(x(i)) * v1(i)).sum
      (0 until 64).map(i =>
        sdivRaw(BigInt(x(i)) * d - BigInt(v1(i)) * s, BigInt(1000000000)).toLong)
        .toArray
    }
    val v2 = power(resid)
    val dot = (0 until 64).map(i => BigInt(v1(i)) * v2(i)).sum
    val n1 = v1.map(c => BigInt(c) * c).sum
    val n2 = v2.map(c => BigInt(c) * c).sum
    val bound = (if (dot < 0) -1 else 1) *
      (dot.abs * 1000000 / n1.max(n2)).toLong
    val got = q("q_pca_deflate").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.map(_._2).toSeq == v1.toSeq, "v1")
    assert(got.map(_._3).toSeq == v2.toSeq, "v2")
    assert(got.forall(_._4 == bound))
    // deflation's point: the directions are (near-)orthogonal and v2
    // is not a rescaled copy of v1
    assert(math.abs(bound) < 50000L, s"|cos bound| = $bound q6")
    assert(v1.toSeq != v2.toSeq)
  }

  test("Beta-Binomial moment estimates replay; prior is proper") {
    val per = spark.read.parquet(s"$dir/orders.parquet")
      .selectExpr("o_custkey", "CAST(o_orderstatus = 'F' AS LONG) AS f")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).toSeq.map { case (_, xs) => (xs.length.toLong, xs.map(_._2).sum) }
      .filter(_._1 >= 2)
    val rp = per.map { case (n, k) => k * 1000000L / n }
    val nc = BigInt(rp.length)
    val sr = rp.map(BigInt(_)).sum
    val srr = rp.map(r => BigInt(r) * r).sum
    val mean = sr / nc
    val v = (nc * srr - sr * sr) / (nc * nc)
    val m = (mean * (1000000 - mean) - v) * 1000000 / v.max(1)
    val r = q("q_beta_binomial").collect().head
    assert(r.getLong(0) == rp.length.toLong)
    assert(r.getLong(1) == mean.toLong && r.getLong(2) == v.toLong)
    assert(r.getLong(3) == (mean * m / 1000000).toLong, "alpha")
    assert(r.getLong(4) == ((BigInt(1000000) - mean) * m / 1000000).toLong, "beta")
    // a proper overdispersed fit: both shape parameters positive
    assert(r.getLong(3) > 0L && r.getLong(4) > 0L,
      "degenerate prior — rates not overdispersed vs the mean")
  }

  test("learned-index max errors replay; the bound actually bounds") {
    val keys = spark.read.parquet(s"$dir/orders.parquet")
      .selectExpr("o_orderkey",
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS LONG) AS key")
      .collect().map(r => (r.getLong(1), r.getLong(0)))
      .sortBy(identity).zipWithIndex
      .map { case ((key, _), i) => (key, i + 1L) }
    val mx = keys.map(_._1).max
    val segs = keys.groupBy(k => math.min(k._1 * 16 / (mx + 1), 15L))
    def sdiv(a: BigInt, b: BigInt): BigInt =
      if (a >= 0) a * 1000000 / b else -((-a) * 1000000 / b)
    def sdivRaw(a: BigInt, b: BigInt): BigInt =
      if (a >= 0) a / b else -((-a) / b)
    val want = segs.toSeq.map { case (sg, xs) =>
      val n = BigInt(xs.length)
      val sx = xs.map(x => BigInt(x._1)).sum
      val sxx = xs.map(x => BigInt(x._1) * x._1).sum
      val sy = xs.map(x => BigInt(x._2)).sum
      val sxy = xs.map(x => BigInt(x._1) * x._2).sum
      val dx = (n * sxx - sx * sx).max(1)
      val b = sdiv(n * sxy - sx * sy, dx)
      val a = sdiv(sy * sxx - sx * sxy, dx)
      val maxErr = xs.map { case (key, rank) =>
        (BigInt(rank) - sdivRaw(b * key + a, BigInt(1000000))).abs
      }.max
      (sg, xs.length.toLong, b.toLong, maxErr.toLong)
    }.toSet
    val got = q("q_learned_index").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want)
    // a useful learned index: every segment's error window is far
    // smaller than the segment itself
    assert(got.forall(g => g._4 < g._2), "error window >= segment size")
  }
}
