package graft

import graft.operators.ConnectedComponents

class ConnectedComponentsSpec extends GraftSuite {
  import spark.implicits._

  test("min-label propagation resolves chains, triangles, and separate components") {
    // components: {1,2,3,4} (a chain), {10,11,12} (a triangle), {20,21}
    val pairs = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (21L, 20L),
    ).toDF("id_a", "id_b")
    val out = ConnectedComponents.minLabelPropagation(pairs, "id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("clusters labels unpaired docs as singletons and flags canonicals") {
    val docs = Seq(1L, 2L, 3L, 99L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val out = ConnectedComponents.clusters(docs, pairs, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false), (99L, 99L, true)))
  }

  test("a long chain fails loudly when the iteration budget is too small") {
    // diameter 30 chain: label 0 needs ~30 rounds to reach the far end
    val chain = (0L until 30L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    intercept[IllegalArgumentException] {
      ConnectedComponents.minLabelPropagation(chain, "id_a", "id_b", maxIter = 3)
    }
    // and converges with the default budget
    val ok = ConnectedComponents.minLabelPropagation(chain, "id_a", "id_b")
      .collect().map(r => r.getLong(1)).distinct
    assert(ok.toSeq == Seq(0L))
  }
}
