package graft

import org.apache.spark.sql.functions._

/** q_countmin, q_domain_cap, q_semdedup: the Count-Min guarantee, the
  * cap's top-K semantics, and SemDeDup's planted-duplicate gate on the
  * sf0.001 fixtures, plus the plan shapes that keep each scale-safe.
  */
class SketchCorpusSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"
  private def q(key: String) = SparkEntry.queries(key)(spark, dir)

  // ------------------------------------------------------------- count-min

  test("count-min never underestimates and stays inside the 2N/w bound") {
    val rows = q("q_countmin").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.length == 10, "ten probe tokens")
    rows.foreach { case (tok, exact, est, ok) =>
      assert(est >= exact, s"CM must overestimate: $tok est $est < exact $exact")
      assert(ok, s"probe $tok outside the 2N/w bound")
    }
    // w=16 over a ~31-token vocabulary MUST collide somewhere — the
    // audit is only meaningful if some estimate strictly exceeds exact
    assert(rows.exists { case (_, exact, est, _) => est > exact },
      "sketch too wide for the fixture vocabulary: audit is vacuous")
  }

  test("count-min sketch is one aggregate over a map-side explode (no window)") {
    val plan = q("q_countmin").queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"no window in the sketch build:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"probe join must broadcast (probe side is O(k·d)):\n$plan")
  }

  // ------------------------------------------------------------ domain cap

  test("domain cap keeps exactly the top-15 per source by (n_chars desc, id)") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expectedKept = docs.groupBy(_._2).values.flatMap { g =>
      g.sortBy { case (id, _, n) => (-n, id) }.take(15)
    }.map(_._1).toSet
    val out = q("q_domain_cap").collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(out.size == docs.length, "one verdict per document")
    assert(out.filter(_._2).keySet == expectedKept,
      "kept set must be the deterministic per-source top-K")
    // the fixture has 25 docs per source — the cap provably bites
    assert(out.count(!_._2) > 0, "cap never bit: fixture/cap drifted")
  }

  test("domain cap is a heap aggregate + broadcast join (no window, no sort-merge)") {
    val plan = q("q_domain_cap").queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"rank must be the topk_by heap:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"surviving ids are O(K·sources) and must broadcast:\n$plan")
  }

  // -------------------------------------------------------------- semdedup

  test("semdedup drops exactly the planted duplicates") {
    val out = q("q_semdedup").collect()
      .map(r => (r.getLong(0), r.getBoolean(2)))
    val planted = out.collect { case (id, _) if id >= 10000L => id }.toSet
    assert(planted.nonEmpty, "planted duplicate set missing from output")
    val dropped = out.collect { case (id, kept) if !kept => id }.toSet
    // every planted copy shares a cell with its identical original and
    // has the higher id → dropped; the isotropic originals (max natural
    // cosine ~0.51) all survive
    assert(dropped == planted,
      s"dropped must be exactly the planted copies: extra=${dropped -- planted} missing=${planted -- dropped}")
  }

  test("semdedup pair scan is cell-bounded (join keyed on cid, assignment map-only)") {
    val plan = q("q_semdedup").queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"pair scan must be the per-cell equi-join, never all-pairs:\n$plan")
  }
}
