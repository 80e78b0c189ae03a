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

  test("doc_chunk and winnow handle degenerate documents") {
    // the sf fixtures have no doc shorter than winnow's k+w-1 minimum, so
    // pin the boundary semantics on a tiny synthetic table
    val dir = java.nio.file.Files.createTempDirectory("graft_docs_edge").toString
    Seq((1L, "", "en", "s", 0L), (2L, "one two", "en", "s", 7L),
        (3L, Seq.fill(70)("tok").mkString(" "), "en", "s", 280L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val chunks = SparkEntry.queries("q_doc_chunk")(spark, dir)
      .orderBy("doc_id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    // empty + short docs yield their one (partial) chunk; the 70-token
    // doc splits at stride 48 with the 16-token overlap
    assert(chunks.toSeq == Seq((1L, 0L, 1L), (2L, 0L, 2L), (3L, 0L, 64L), (3L, 1L, 22L)))
    val fps = SparkEntry.queries("q_winnow")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // docs below k+w-1 = 6 tokens emit nothing; the all-identical-gram
    // doc collapses to exactly one fingerprint
    assert(fps.map(_._1).toSeq == Seq(3L))
    assert(fps.head._2 == 1L && fps.head._3 == fps.head._4)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("as-of join with an empty right side null-fills every left row") {
    val left = Seq((1L, 7L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")))
      .toDF("event_id", "user_id", "ts")
    val right = Seq.empty[(Long, java.sql.Timestamp, Long)].toDF("user_id", "ts", "payload")
    val out = AsofJoin.lastPriorMatch(left, right, "user_id", "ts", "ts", "payload", "p")
      .collect()
    assert(out.length == 1 && out.head.isNullAt(3))
  }

  test("global rank on an empty frame is empty, on one row is rank 1") {
    val empty = Seq.empty[(Long, Long)].toDF("v", "k")
    assert(PrefixSum.withGlobalRank(empty, Seq("v", "k")).count() == 0)
    val one = PrefixSum.withGlobalRank(Seq((5L, 1L)).toDF("v", "k"), Seq("v", "k"))
      .collect()
    assert(one.length == 1 && one.head.getLong(2) == 1L)
  }

  test("dup-spans on a corpus with no cross-doc grams reports all zeros") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dup_edge").toString
    Seq((1L, "alpha beta gamma delta epsilon zeta", "en", "s", 35L),
        (2L, "one two three four five six seven", "en", "s", 33L),
        (3L, "", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_dup_spans")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(out.length == 3, "every doc (even empty) gets a verdict row")
    assert(out.forall(t => t._2 == 0L && t._3 == 0L),
      "disjoint docs must carry zero duplicated spans")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("interval islands: identical timestamps and zero-length intervals merge") {
    // two events at the same instant with zero duration → one island of
    // zero covered time; a third disjoint event → its own island
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val dir = java.nio.file.Files.createTempDirectory("graft_iv_edge").toString
    // the events read path treats ts as long NANOS (ts DIV 1000 → µs)
    Seq((1L, 1000000000L, 7L, "a", 0.0, "{}"),
        (2L, 1000000000L, 7L, "a", 0.0, "{}"),
        (3L, 9000000000000L, 7L, "a", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_interval_coverage")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((7L, 2L, 0L)),
      s"two islands of zero-length coverage expected: ${out.toSeq}")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
