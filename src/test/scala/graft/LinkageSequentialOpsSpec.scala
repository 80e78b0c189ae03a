package graft

/** q_fuzzy_phone, q_group_sequential: driver-side replays of the
  * round-10 record-linkage / interim-analysis surface. */
class LinkageSequentialOpsSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"
  private def q(key: String) = SparkEntry.queries(key)(spark, dir)

  private val mod = BigInt("36028797018963913")
  private def h1(k: Long) =
    (BigInt(k) * BigInt("6364136223846793005") mod mod).toLong
  private def h2(k: Long) =
    (BigInt(k) * BigInt("2862933555777941757") mod mod).toLong

  test("fuzzy phone linkage replays; planted transpositions are found") {
    val keys = spark.read.parquet(s"$dir/customer.parquet")
      .selectExpr("c_custkey").collect().map(_.getLong(0))
    def phone(k: Long) = "+7" + ("0" * 10 + k.toString).takeRight(10)
    val base = keys.map(k => (k, phone(k)))
    val planted = keys.filter(k => h1(k) % 16 == 0).map { k =>
      val p = phone(k)
      val pos = (h1(k) % 9).toInt // 0-based swap offset in the tail
      val i = 2 + pos // string index of the first swapped char
      (k + 100000000L,
        p.substring(0, i) + p.charAt(i + 1) + p.charAt(i) + p.substring(i + 2))
    }
    val organic = base ++ planted
    def blk(p: String) = p.substring(2).sorted
    val cap = {
      val sizes = organic.groupBy(x => blk(x._2)).map(_._2.size.toLong)
      math.max(64L, 16 * sizes.sum / sizes.size)
    }
    val mega = (0L to cap).map(i => (300000000L + i, "+79999999999"))
    val all = organic ++ mega
    val blocks = all.groupBy(x => blk(x._2))
    val keepB = blocks.filter(_._2.size <= cap)
    val nMega = blocks.count(_._2.size > cap).toLong
    def isTrans(a: String, b: String): Boolean =
      (0 until a.length - 1).exists { i =>
        a.substring(0, i) == b.substring(0, i) &&
          a.substring(i + 2) == b.substring(i + 2) &&
          a(i) == b(i + 1) && a(i + 1) == b(i) && a(i) != a(i + 1)
      }
    var cand = 0L; var trans = 0L
    for ((_, members) <- keepB) {
      val sorted = members.sortBy(_._1)
      for (i <- sorted.indices; j <- (i + 1) until sorted.length) {
        cand += 1
        if (isTrans(sorted(i)._2, sorted(j)._2)) trans += 1
      }
    }
    val r = q("q_fuzzy_phone").collect().head
    assert(r.getLong(0) == all.length.toLong, "n_phones")
    assert(r.getLong(1) == blocks.size.toLong, "n_blocks")
    assert(r.getLong(2) == nMega, "n_mega_blocks")
    assert(r.getLong(3) == cand, "n_candidates")
    assert(r.getLong(4) == trans, "n_transpositions")
    // every planted NON-DEGENERATE transposition must be recovered:
    // the count at least matches the planted pairs with distinct digits
    val plantedReal = planted.count { case (k, p) =>
      isTrans(phone(k - 100000000L), p)
    }
    assert(trans >= plantedReal && plantedReal > 0,
      s"planted $plantedReal but detected $trans")
    assert(nMega == 1L, "planted mega block did not fire the cap")
  }

  test("group-sequential looks replay; looks nest and bounds decrease") {
    val rows = spark.read.parquet(s"$dir/orders.parquet")
      .selectExpr("o_orderkey", "CAST(o_orderstatus = 'F' AS LONG)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .map { case (k, y) => ((h1(k) % 2).toInt, (h2(k) % 4).toInt, y) }
    val bounds = Map(1L -> 16387302L, 2L -> 8193651L, 3L -> 5462434L,
      4L -> 4096826L)
    val want = (1L to 4L).map { look =>
      val xs = rows.filter(_._2 < look)
      val n = BigInt(xs.length)
      val n0 = BigInt(xs.count(_._1 == 0))
      val y0 = BigInt(xs.filter(_._1 == 0).map(_._3).sum)
      val y1 = BigInt(xs.filter(_._1 == 1).map(_._3).sum)
      val dev = y0 * (n - n0) - y1 * n0
      val den = (n0 * (n - n0) * (y0 + y1) * (n - y0 - y1)).max(1)
      val z2 = (n * dev * dev * 1000000 / den).toLong
      (look, xs.length.toLong, z2, bounds(look), z2 >= bounds(look))
    }.toSet
    val got = q("q_group_sequential").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSet
    assert(got == want)
    // an A/A split on a hash must NOT cross OBF bounds
    assert(got.forall(!_._5), "null experiment crossed the boundary")
    // information accrues monotonically
    val ns = got.toSeq.sortBy(_._1).map(_._2)
    assert(ns.zip(ns.tail).forall { case (a, b) => a < b })
  }
}
