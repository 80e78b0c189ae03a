package graft

import org.apache.spark.sql.functions._

/** q_table_diff, q_cooccur_pmi, q_embed_centroid: hand-computed change
  * counts / PMI / distances, and the join shapes that keep each one
  * scale-safe (co-partitioned full outer, bounded self-join, broadcast
  * centroids). */
class ReconCorpusSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"
  private def q(key: String) = SparkEntry.queries(key)(spark, dir)

  // ---------------------------------------------------------- table diff

  test("table diff reports exactly the constructed changes") {
    val keys = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey").collect().map(_.getLong(0))
    val removed = keys.count(_ % 97 == 0)
    val added = keys.count(_ % 101 == 0)
    val changed = keys.count(k => k % 13 == 0 && k % 97 != 0)
    val got = q("q_table_diff").groupBy("change_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.getOrElse("removed", 0L) == removed)
    assert(got.getOrElse("added", 0L) == added)
    assert(got.getOrElse("changed", 0L) == changed)
    assert(got.keySet == Set("removed", "added", "changed"))
  }

  test("table diff price semantics: changed rows differ by exactly 10") {
    q("q_table_diff").filter(col("change_type") === "changed").collect()
      .foreach { r =>
        assert(math.abs(r.getDouble(3) - r.getDouble(2) - 10.0) < 1e-9)
      }
  }

  test("table diff joins co-partitioned, no table-sized broadcast") {
    val plan = q("q_table_diff").queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") && plan.contains("FullOuter"),
      s"expected a shuffle full-outer join:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"),
      s"neither snapshot may broadcast (table-sized at scale):\n$plan")
  }

  // ---------------------------------------------------------------- pmi

  test("cooccur PMI matches a hand computation for the heaviest pair") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), split(trim(lower(col("text"))), "\\s+").as("toks"))
      .collect().map(r => r.getSeq[String](1).distinct.toSet)
    val top = q("q_cooccur_pmi").head()
    val (x, y) = (top.getString(0), top.getString(1))
    val cxy = docs.count(d => d.contains(x) && d.contains(y))
    val cx = docs.count(_.contains(x)); val cy = docs.count(_.contains(y))
    assert(top.getLong(2) == cxy)
    val pmi = math.log(cxy.toDouble * docs.length / (cx.toDouble * cy.toDouble))
    assert(math.abs(top.getDouble(3) - pmi) < 1e-6)
    assert(x < y, "pairs must be emitted in canonical order")
  }

  test("cooccur PMI self-join is doc-keyed, never a cross join") {
    val plan = q("q_cooccur_pmi").queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cross join in pmi:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"vocab must broadcast into the pair join:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-100 must be a per-partition top-k, not a global sort:\n$plan")
  }

  // ----------------------------------------------------------- centroid

  test("embed centroid distances match a driver-side hand computation") {
    val rows = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("label", "embedding").collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1).toArray)
    val byLabel = rows.groupBy(_._1)
    val expect = byLabel.map { case (label, vs) =>
      val n = vs.length
      val cent = (0 until 64).map { d =>
        val s = vs.map(v => math.floor(v._2(d).toDouble * 1e7).toLong).sum
        s.toDouble / (n.toDouble * 1e7)
      }
      val d2s = vs.map { case (_, v) =>
        v.indices.foldLeft(0.0)((acc, i) =>
          acc + (v(i).toDouble - cent(i)) * (v(i).toDouble - cent(i)))
      }
      val avg = d2s.map(d => math.floor(d * 1e9).toLong).sum.toDouble / (1e9 * n)
      label -> (n.toLong, avg, d2s.max)
    }
    q("q_embed_centroid").collect().foreach { r =>
      val (n, avg, mx) = expect(r.getInt(0))
      assert(r.getLong(1) == n)
      assert(math.abs(r.getDouble(2) - avg) < 1e-6, s"label ${r.getInt(0)} avg")
      assert(math.abs(r.getDouble(3) - mx) < 1e-6, s"label ${r.getInt(0)} max")
    }
  }

  test("embed centroid broadcasts the centroids, not the corpus") {
    val plan = q("q_embed_centroid").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"centroids (labels x dims) must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }
}
