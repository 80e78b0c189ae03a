package graft

import graft.operators.Decontamination

class DecontaminationSpec extends GraftSuite {
  import spark.implicits._

  test("copied eval text flags as contaminated; disjoint and light overlap don't") {
    val eval_ = Seq((1L, "the quick brown fox jumps over the lazy dog end"))
      .toDF("doc_id", "text") // 10 tokens → 8 distinct 3-shingles
    val train = Seq(
      (100L, "intro words the quick brown fox jumps over the lazy dog end more"),
      (101L, "completely different words with zero shared trigram content here"),
      (102L, "the quick brown cat sat"), // shares exactly "the quick brown"
    ).toDF("doc_id", "text")
    val out = Decontamination.overlapCounts(train, eval_, "doc_id", "text",
      shingleK = 3, minShingles = 5)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2)))
    assert(out.toSeq == Seq(
      (100L, 8, true),  // the full eval run is embedded → all 8 shingles
      (101L, 0, false),
      (102L, 1, false)))
  }
}
