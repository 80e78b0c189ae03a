package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** Degenerate-input robustness: operators must return empty/identity
  * results, never throw, on empty frames and empty documents. */
class EdgeCasesSpec extends GraftSuite {
  import spark.implicits._

  private def emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")

  test("LSH dedup on an empty corpus yields zero pairs") {
    assert(MinHashLSH.nearDupPairs(emptyDocs, "doc_id", "text").count() == 0)
    assert(SimHash.nearDupPairs(emptyDocs, "doc_id", "text").count() == 0)
  }

  test("empty and whitespace-only documents don't break shingling") {
    val docs = Seq((1L, ""), (2L, "   "), (3L, "one real document here")).toDF("doc_id", "text")
    val sh = docs.select(TextAnalysis.hashedShingles(col("text"), 3).as("s"))
      .as[Seq[Long]].collect()
    assert(sh.forall(_.nonEmpty)) // empty text → one shingle of the empty token
    // empty docs hash identically → they pair with each other, not with real text
    val pairs = MinHashLSH.nearDupPairs(docs, "doc_id", "text", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("dedup against an empty existing set keeps everything") {
    val incoming = Seq((1L, "a"), (2L, "b")).toDF("id", "phone")
    val existing = Seq.empty[String].toDF("phone")
    assert(Dedup.newRows(incoming, existing, "phone").count() == 2)
    assert(Dedup.skippedRows(incoming, existing, "phone").count() == 0)
  }

  test("upsert with an empty updates frame is the identity") {
    val base = Seq((1L, 10.0)).toDF("id", "bal")
    val updates = Seq.empty[(Long, Double)].toDF("id", "bal")
    val out = Upsert.update(base, updates, "id", Seq("bal")).collect()
    assert(out.length == 1 && out.head.getDouble(1) == 10.0)
  }

  test("top-k on a group smaller than k returns the whole group, ranked") {
    val corpus = Seq((10L, Seq(1.0f, 0.0f)), (11L, Seq(0.5f, 0.5f))).toDF("vec_id", "embedding")
    val queries = Seq((1L, Seq(1.0f, 0.0f))).toDF("q_id", "embedding")
    val out = Similarity.bruteForceTopK(queries, corpus, k = 10)
      .orderBy("rank").select("vec_id", "rank").as[(Long, Int)].collect()
    assert(out.toSeq == Seq((10L, 1), (11L, 2)))
  }

  test("as-of join with an empty right side null-fills every left row") {
    val left = Seq((1L, 7L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")))
      .toDF("event_id", "user_id", "ts")
    val right = Seq.empty[(Long, java.sql.Timestamp, Long)].toDF("user_id", "ts", "payload")
    val out = AsofJoin.lastPriorMatch(left, right, "user_id", "ts", "ts", "payload", "p")
      .collect()
    assert(out.length == 1 && out.head.isNullAt(3))
  }
}
