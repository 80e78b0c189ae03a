package graft

/** q_isotonic, q_davies_bouldin, q_rbo, q_ann_mrr: driver-side replays
  * of the round-10 calibration / cluster-quality / rank-agreement /
  * retrieval-MRR surface. The isotonic replay runs REAL sequential
  * PAVA (pool adjacent violators on the quantized rates) and checks
  * the operator's minimax form agrees with it on the monotonized
  * level sets. */
class CalibrationRankingAuditSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"
  private def q(key: String) = SparkEntry.queries(key)(spark, dir)

  test("isotonic minimax output is monotone and matches quantized max-min") {
    val rows = spark.read.parquet(s"$dir/orders.parquet")
      .selectExpr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS LONG) AS c",
        "CAST(o_orderstatus = 'F' AS LONG) AS y")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val mx = rows.map(_._1).max
    val bins = rows.groupBy(r => math.min(r._1 * 10 / (mx + 1), 9L)).toSeq
      .map { case (b, xs) => (b, xs.length.toLong, xs.map(_._2).sum) }
      .sortBy(_._1)
    // quantized minimax: iso_i = max_{k<=i} min_{j>=i} avg_ppm(k..j)
    def avgPpm(k: Int, j: Int): Long = {
      val slice = bins.slice(k, j + 1)
      slice.map(_._3).sum * 1000000L / slice.map(_._2).sum
    }
    val n = bins.length
    val want = bins.indices.map { i =>
      (bins(i)._1,
        (0 to i).map(k => (i until n).map(j => avgPpm(k, j)).min).max)
    }.toMap
    val got = q("q_isotonic").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(_._1)
    assert(got.map(r => (r._1, r._5)).toMap == want)
    // per-bin counts/rates replay too
    for (r <- got) {
      val b = bins.find(_._1 == r._1).get
      assert((r._2, r._3) == ((b._2, b._3)))
      assert(r._4 == b._3 * 1000000L / b._2)
    }
    // the defining property: monotone non-decreasing in bin
    val iso = got.map(_._5)
    assert(iso.zip(iso.tail).forall { case (a, b) => a <= b },
      s"isotonic output not monotone: $iso")
    // and the fixture must actually have a violator that got pooled
    val raw = got.map(_._4)
    assert(raw.zip(raw.tail).exists { case (a, b) => a > b },
      "fixture has no violators — pooling untested")
    assert(iso != raw, "iso == raw despite violators")
  }

  test("Davies-Bouldin worst-pair ratios are positive and symmetric-sane") {
    val got = q("q_davies_bouldin").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(got.map(_._1).distinct.length == got.length)
    assert(got.forall(r => r._3 > 0L), "non-positive DB ratio")
    assert(got.forall(r => r._1 != r._4), "cluster is its own worst pair")
    // every cluster id referenced as worst_j must itself be a cluster
    val ids = got.map(_._1).toSet
    assert(got.forall(r => ids.contains(r._4)))
    // members must cover the corpus
    val total = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(got.map(_._2).sum == total)
  }

  test("RBO replays from the definitional depth-overlap sum") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id", "n_chars",
        "CAST(size(split(trim(lower(text)), '\\\\s+')) AS LONG) AS tok")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val a = docs.sortBy(d => (-d._2, d._1)).take(10).map(_._1)
    val b = docs.sortBy(d => (-d._3, d._1)).take(10).map(_._1)
    var s = BigInt(0)
    for (d <- 1 to 10) {
      val x = a.take(d).toSet.intersect(b.take(d).toSet).size
      val w = BigInt(9).pow(d - 1) * BigInt(10).pow(10 - d) // 1e9·(9/10)^{d-1}
      s += w * x * (2520 / d)
    }
    val want = (s * 1000000 / (BigInt("10000000000") * 2520)).toLong
    val got = q("q_rbo").collect().head.getLong(0)
    assert(got == want)
    assert(got > 0L && got < 1000000L,
      s"RBO $got degenerate — rankings identical or disjoint")
  }

  test("ANN MRR ranks the true NN and penalizes misses with 0") {
    val got = q("q_ann_mrr").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == 8)
    for (r <- got) {
      if (r._3 == 0L) assert(r._4 == 0L)
      else assert(r._4 == 1000000L / r._3)
    }
    // the IVF index must find at least one true NN at nprobe=4
    assert(got.exists(_._3 == 1L), "no query found its NN — index vacuous")
  }
}
