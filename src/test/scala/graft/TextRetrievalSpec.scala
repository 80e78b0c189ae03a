package graft

import org.apache.spark.sql.functions._

/** q_vocab_encode + q_bm25: encoding invariants, a hand-computed BM25
  * score, and the broadcast plan shapes that keep both map-side at
  * corpus scale. */
class TextRetrievalSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"
  private def q(key: String) = SparkEntry.queries(key)(spark, dir)

  // --------------------------------------------------------------- vocab

  test("vocab encode: ids align 1:1 with tokens, OOV marked 0, ids within V") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val rows = q("q_vocab_encode").collect()
    assert(rows.length == docs.count())
    rows.foreach { r =>
      val nTokens = r.getLong(1)
      val nOov = r.getLong(2)
      val ids = r.getString(3).split(",").map(_.toInt)
      assert(ids.length == nTokens, s"doc ${r.getLong(0)}: ids/token mismatch")
      assert(ids.count(_ == 0) == nOov)
      assert(ids.forall(id => id >= 0 && id <= 512))
    }
    // vocab is min(512, types/2) — real OOV must exist at every SF
    // (the fixed 512 covered the whole synthetic type space and n_oov
    // was structurally zero — r10 vacuity fix)
    assert(rows.map(_.getLong(2)).sum > 0, "no OOV tokens — vocab cut vacuous")
  }

  test("vocab encode: most frequent token gets id 1 and round-trips in order") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val top = docs
      .select(col("doc_id"), explode(array_distinct(
        split(trim(lower(col("text"))), "\\s+"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("df"))
      .orderBy(desc("df"), asc("tok")).head().getString(0)
    // find a doc starting with the top token: its first id must be 1
    val doc = docs.filter(lower(col("text")).startsWith(top + " "))
      .select("doc_id").head().getLong(0)
    val ids = q("q_vocab_encode").filter(col("doc_id") === doc)
      .head().getString(3).split(",")
    assert(ids.head == "1", s"top-df token must encode to id 1, got ${ids.head}")
  }

  test("vocab encode: the id lookup joins broadcast (map-side at corpus scale)") {
    val plan = q("q_vocab_encode").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"vocab must broadcast, not shuffle the corpus:\n$plan")
  }

  // ---------------------------------------------------------------- bm25

  test("bm25 matches a driver-side hand computation for one document") {
    val terms = Seq("spark", "merge", "vector")
    val k1 = 1.2; val b = 0.75
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), split(trim(lower(col("text"))), "\\s+").as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val nDocs = docs.size
    val avgdl = docs.values.map(_.length.toLong).sum.toDouble / nDocs
    val df = terms.map(t => t -> docs.values.count(_.contains(t))).toMap
    // pick the first doc containing at least one query term
    val (docId, toks) = docs.toSeq.sortBy(_._1)
      .find(_._2.exists(terms.contains)).get
    val expected = terms.flatMap { t =>
      val tf = toks.count(_ == t)
      if (tf == 0) None
      else {
        val idf = math.log(1.0 + (nDocs - df(t) + 0.5) / (df(t) + 0.5))
        Some(idf * (tf * (k1 + 1.0)) /
          (tf + k1 * (1.0 - b + b * toks.length / avgdl)))
      }
    }.map(s => math.floor(s * 1e9).toLong).sum / 1e9
    val got = q("q_bm25").filter(col("doc_id") === docId).head()
    assert(math.abs(got.getDouble(2) - expected) < 1e-6,
      s"doc $docId: got ${got.getDouble(2)}, hand-computed $expected")
  }

  test("bm25 reports only docs containing a query term, scores positive") {
    val rows = q("q_bm25").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 1 && r.getLong(1) <= 3)
      assert(r.getDouble(2) > 0.0, s"doc ${r.getLong(0)}: non-positive score")
    }
  }

  test("bm25: one corpus shuffle, stats broadcast, no corpus join") {
    val plan = q("q_bm25").queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in bm25:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"bm25 must not shuffle-join the corpus:\n$plan")
    // the only hash-partitioned exchanges are the per-doc aggregate in
    // the score pass and its re-derivation inside the broadcast stats
    // subtree (the global-normalization second pass, as in q_tfidf) —
    // both keyed on doc_id, nothing keyed on (doc, term)
    val ex = "Exchange hashpartitioning\\(doc_id".r.findAllIn(plan).size
    assert(ex == "Exchange hashpartitioning".r.findAllIn(plan).size && ex <= 2,
      s"expected only doc_id-keyed corpus shuffles (score + stats pass):\n$plan")
  }
}
