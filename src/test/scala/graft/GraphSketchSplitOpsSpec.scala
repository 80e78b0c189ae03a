package graft

/** q_hyperanf, q_chow_test, q_best_split: driver-side replays of the
  * round-10 neighborhood-function / structural-break / split-finding
  * surface. The HyperANF replay runs EXACT BFS reachability and checks
  * the KMV estimates land within the sketch's error envelope — plus a
  * bit-exact replay of the capped sketch iteration itself. */
class GraphSketchSplitOpsSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"
  private def q(key: String) = SparkEntry.queries(key)(spark, dir)

  private lazy val edges: Array[(Long, Long)] = {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .selectExpr("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    li.groupBy(_._1).values.flatMap { ps =>
      val parts = ps.map(_._2).distinct.sorted
      for (i <- parts.indices; j <- (i + 1) until parts.length)
        yield (parts(i), parts(j))
    }.groupBy(identity).filter(_._2.size >= 2).keys.toArray
  }

  test("HyperANF sketches replay bit-exact; estimates track true reach") {
    val M = 1125899906842624L
    val mod = BigInt("36028797018963913")
    def h(v: Long): Long =
      ((BigInt(v) * BigInt("6364136223846793005") mod mod) mod M).toLong
    val adj = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (v, xs) => (v, xs.map(_._2)) }
    val nodes = adj.keys.toArray
    // bit-exact replay of the capped iteration
    var sk: Map[Long, Set[Long]] = nodes.map(v => v -> Set(h(v))).toMap
    def cap(s: Set[Long]): Set[Long] = s.toSeq.sorted.take(32).toSet
    def estRow(hop: Int): (Long, Long, Long) = {
      val ests = nodes.map { v =>
        val sz = sk(v).size
        if (sz < 32) sz.toLong else 31L * M / sk(v).max
      }
      (hop.toLong, nodes.length.toLong, ests.sum)
    }
    var want = Vector(estRow(0))
    for (hop <- 1 to 3) {
      sk = nodes.map { v =>
        v -> cap(sk(v) ++ adj(v).flatMap(sk).toSet)
      }.toMap
      want = want :+ estRow(hop)
    }
    val got = q("q_hyperanf").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toVector
    assert(got == want)
    // sanity vs TRUE reachability: estimates within 40% at every hop
    var reach: Map[Long, Set[Long]] = nodes.map(v => v -> Set(v)).toMap
    for (_ <- 1 to 3)
      reach = nodes.map(v => v -> (reach(v) ++ adj(v).flatMap(reach).toSet)).toMap
    val trueSum = nodes.map(v => reach(v).size.toLong).sum
    val est3 = got.last._3
    assert(math.abs(est3 - trueSum).toDouble / trueSum < 0.4,
      s"hop-3 estimate $est3 vs true $trueSum")
    // the curve must be non-decreasing (reach only grows)
    assert(got.map(_._3).sliding(2).forall(p => p(0) <= p(1)))
  }

  test("Chow F replays from the quantized two-segment fits") {
    val daily = spark.read.parquet(s"$dir/orders.parquet")
      .selectExpr("date_format(o_orderdate, 'yyyy-MM-dd') AS d",
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS LONG) AS y")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (d, xs) => (d, xs.map(_._2).sum) }
      .toSeq.sortBy(_._1)
    val d0 = java.time.LocalDate.parse(daily.head._1)
    val xy = daily.map { case (d, y) =>
      (java.time.temporal.ChronoUnit.DAYS
        .between(d0, java.time.LocalDate.parse(d)), BigInt(y))
    }
    val mid = java.time.temporal.ChronoUnit.DAYS
      .between(d0, java.time.LocalDate.parse(daily.last._1)) / 2
    def sdiv(a: BigInt, b: BigInt): BigInt =
      if (a >= 0) a * 1000000 / b else -((-a) * 1000000 / b)
    def sdivRaw(a: BigInt, b: BigInt): BigInt =
      if (a >= 0) a / b else -((-a) / b)
    def sse(rows: Seq[(Long, BigInt)]): BigInt = {
      val n = BigInt(rows.length)
      val sx = rows.map(r => BigInt(r._1)).sum
      val sxx = rows.map(r => BigInt(r._1) * r._1).sum
      val sy = rows.map(_._2).sum
      val sxy = rows.map(r => BigInt(r._1) * r._2).sum
      val dx = (n * sxx - sx * sx).max(1)
      val b = sdiv(n * sxy - sx * sy, dx)
      val a = sdiv(sy * sxx - sx * sxy, dx)
      rows.map { case (x, y) =>
        val ec = sdivRaw(y * 1000 - sdivRaw(b * x * 1000 + a * 1000,
          BigInt(1000000)), BigInt(1000))
        ec * ec
      }.sum
    }
    val ssep = sse(xy)
    val sse12 = sse(xy.filter(_._1 <= mid)) + sse(xy.filter(_._1 > mid))
    val n = BigInt(xy.length)
    val r = q("q_chow_test").collect().head
    assert(r.getLong(0) == xy.length.toLong)
    assert(r.getLong(1) == (ssep / n).toLong, "mse_pooled")
    assert(r.getLong(2) == (sse12 / n).toLong, "mse_segments")
    assert(r.getLong(3) ==
      ((ssep - sse12).max(0) * (n - 4) * 1000 / (sse12.max(1) * 2)).toLong)
    // segment fits can only reduce (quantized) SSE in a sane fixture
    assert(r.getLong(1) >= r.getLong(2))
  }

  test("best-split gains replay; argmax is a real boundary") {
    val rows = spark.read.parquet(s"$dir/orders.parquet")
      .selectExpr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS LONG)",
        "CAST(o_orderstatus = 'F' AS LONG)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val mx = rows.map(_._1).max
    val bins = rows.groupBy(r => math.min(r._1 * 32 / (mx + 1), 31L))
      .map { case (b, xs) => (b, xs.length.toLong, xs.map(_._2).sum) }
      .toSeq.sortBy(_._1)
    val tn = bins.map(_._2).sum; val tp = bins.map(_._3).sum
    def gini(n: Long, p: Long): BigInt =
      BigInt(n) * 1000000 -
        (BigInt(p) * p + BigInt(n - p) * (n - p)) * 1000000 / BigInt(n).max(1)
    val parent = gini(tn, tp)
    var nl = 0L; var pl = 0L
    val want = bins.filter(_._1 < 31).map { case (b, n, p) =>
      nl += n; pl += p
      (b, nl, pl, (parent - gini(nl, pl) - gini(tn - nl, tp - pl)).toLong)
    }.filter(r => r._2 > 0 && r._2 < tn).toSet
    val got = q("q_best_split").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want)
    // gains must discriminate and at least one split must be positive
    assert(got.map(_._4).size > 1)
  }
}
