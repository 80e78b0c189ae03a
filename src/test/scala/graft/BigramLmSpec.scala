package graft

import org.apache.spark.sql.functions._

/** q_bigram_lm: a full driver-side re-derivation of the model and one
  * document's cross-entropy, plus the bounded-model plan shape. */
class BigramLmSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"
  private def q() = SparkEntry.queries("q_bigram_lm")(spark, dir)

  test("cross-entropy matches a driver-side model re-derivation") {
    val V = 256; val alpha = 0.5
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), split(trim(lower(col("text"))), "\\s+").as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toVector).toMap
    // vocab: top-V by df (df desc, token asc), rank = id, OOV = 0
    val df = docs.values.flatMap(_.distinct).groupBy(identity)
      .map { case (t, xs) => t -> xs.size }
    val vocab = df.toSeq.sortBy { case (t, d) => (-d, t) }.take(V)
      .zipWithIndex.map { case ((t, _), i) => t -> (i + 1) }.toMap
    val idSeqs = docs.map { case (id, toks) =>
      id -> toks.map(vocab.getOrElse(_, 0))
    }
    val allPairs = idSeqs.values.flatMap(s => s.zip(s.tail)).toSeq
    val c12 = allPairs.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    val c1 = allPairs.groupBy(_._1).map { case (a, xs) => a -> xs.size.toLong }
    def xentOf(ids: Vector[Int]): (Long, Double) = {
      val ps = ids.zip(ids.tail).map { case (a, b) =>
        math.log((c12.getOrElse((a, b), 0L).toDouble + alpha) /
          (c1(a).toDouble + alpha * (V + 1)))
      }
      val s = ps.map(p => math.floor(p * 1e9).toLong).sum
      (ps.length.toLong, -s.toDouble / (1e9 * ps.length))
    }
    val got = q().collect().map(r => r.getLong(0) -> r).toMap
    // every doc with >= 2 tokens is scored; spot-check them all
    idSeqs.filter(_._2.length >= 2).foreach { case (id, ids) =>
      val (n, x) = xentOf(ids)
      val r = got(id)
      assert(r.getLong(1) == n, s"doc $id: bigram count")
      assert(math.abs(r.getDouble(2) - x) < 1e-6,
        s"doc $id: got ${r.getDouble(2)}, expected $x")
    }
  }

  test("cross-entropies are positive and bounded by the uniform model") {
    // -ln p >= -ln(max p) > 0 and p >= alpha / (max_c1 + alpha(V+1))
    val rows = q().collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(2) > 0.0, s"doc ${r.getLong(0)}: non-positive xent")
      assert(r.getDouble(2) < 20.0, s"doc ${r.getLong(0)}: impossibly high xent")
    }
  }

  test("the model broadcasts; only doc-keyed corpus shuffles remain") {
    val plan = q().queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"bigram/context model must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("SortMergeJoin"),
      s"no corpus-sized join side may shuffle:\n$plan")
  }
}
