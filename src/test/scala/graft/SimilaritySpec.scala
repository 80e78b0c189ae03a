package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

class SimilaritySpec extends GraftSuite {
  import spark.implicits._

  test("cosine of known vectors") {
    val df = Seq((Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)), (Seq(1.0f, 1.0f), Seq(1.0f, 1.0f)))
      .toDF("a", "b")
    val out = df.select(Similarity.cosine(col("a"), col("b"))).as[Double].collect()
    assert(math.abs(out(0)) < 1e-12)
    assert(math.abs(out(1) - 1.0) < 1e-12)
  }

  test("bruteForceTopK returns the true nearest neighbours, ranked") {
    val corpus = Seq(
      (10L, Seq(1.0f, 0.0f)), (11L, Seq(0.9f, 0.1f)),
      (12L, Seq(0.0f, 1.0f)), (13L, Seq(-1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val queries = Seq((1L, Seq(1.0f, 0.0f))).toDF("q_id", "embedding")
    val out = Similarity.bruteForceTopK(queries, corpus, k = 2)
      .orderBy("rank").select("vec_id").as[Long].collect()
    assert(out.toSeq == Seq(10L, 11L))
  }

  test("lshTopK finds the exact duplicate (same bucket by construction)") {
    val corpus = Seq((10L, Seq(1.0f, 0.2f, -0.3f, 0.5f)), (11L, Seq(-1.0f, 0.4f, 0.9f, -0.2f)))
      .toDF("vec_id", "embedding")
    val queries = Seq((1L, Seq(1.0f, 0.2f, -0.3f, 0.5f))).toDF("q_id", "embedding")
    val out = Similarity.lshTopK(queries, corpus, k = 1, bits = 4, dim = 4)
      .select("vec_id").as[Long].collect()
    assert(out.toSeq == Seq(10L))
  }

  test("nearDupPairs finds exact copies within LSH buckets, no cross join") {
    val vecs = Seq((1L, Seq(0.5f, 0.5f, -0.1f, 0.2f)), (2L, Seq(0.5f, 0.5f, -0.1f, 0.2f)),
      (3L, Seq(-0.9f, 0.1f, 0.8f, -0.4f)))
      .toDF("vec_id", "embedding")
    val df = Similarity.nearDupPairs(vecs, threshold = 0.99, bits = 4, dim = 4)
    val pairs = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian"), s"cross join in plan:\n$plan")
  }

  test("nearDupPairs prunes a mega-bucket instead of pairing it") {
    // 10 identical vectors all collide in one bucket; with the cap below
    // them the bucket is dropped, not paired — the skew guard that keeps
    // a clustered corpus from going quadratic in one join task.
    val mega = (1L to 10L).map(i => (i, Seq(0.5f, 0.5f, -0.1f, 0.2f)))
    val sane = Seq((20L, Seq(0.9f, -0.2f, 0.3f, 0.1f)), (21L, Seq(0.9f, -0.2f, 0.3f, 0.1f)))
    val vecs = (mega ++ sane).toDF("vec_id", "embedding")
    val capped = Similarity.nearDupPairs(vecs, threshold = 0.99, bits = 4, dim = 4,
      maxBucketSize = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // mega-bucket (size 10 > 5) pruned; the sane size-2 bucket survives
    assert(capped == Set((20L, 21L)), s"got $capped")
    // with a permissive cap the same corpus yields all 45 mega pairs + 1
    val uncapped = Similarity.nearDupPairs(vecs, threshold = 0.99, bits = 4, dim = 4)
      .count()
    assert(uncapped == 46L)
  }

  test("lsh recall vs brute force on real embeddings is sane") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = e.filter(col("vec_id") < 8).select(col("vec_id").as("q_id"), col("embedding"))
    val exact = Similarity.bruteForceTopK(queries, e, k = 5)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(queries, e, k = 5, bits = 4, dim = 64)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    // Single-table 4-bit LSH on near-orthogonal synthetic vectors: expect
    // SOME overlap, and every approx hit must come from the right query.
    assert(approx.nonEmpty)
    assert(approx.map(_._1).subsetOf(exact.map(_._1)))
  }

  test("multi-table lsh lifts near-neighbour recall to >= 0.9 at bits=8, tables=4") {
    // LSH retrieval is for NEAR neighbours: plant a deterministic twin of
    // every vector at cosine ≈ 0.98 (x_i + 0.2·x_{i+1 mod d} — per-bit
    // agreement p ≈ 0.94, so a twin collides in some 8-bit table with
    // prob ≈ 1-(1-p^8)^4 ≈ 0.97). The base corpus is near-orthogonal
    // noise (max natural cosine ≈ 0.45), so NO table-count rescues
    // far-apart pairs — recall is measured on the twins.
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val twins = e.select((col("vec_id") + 100000L).as("vec_id"),
      expr("transform(embedding, (x, i) -> CAST(x + 0.2 * element_at(embedding, (i + 1) % 64 + 1) AS FLOAT))")
        .as("embedding"))
    val corpus = e.unionAll(twins)
    val queries = e.filter(col("vec_id") < 16).select(col("vec_id").as("q_id"), col("embedding"))
    def twinRecall(tables: Int): Double = {
      val hits = Similarity.lshTopK(queries, corpus, k = 5, bits = 8, dim = 64, tables = tables)
        .filter(col("vec_id") === col("q_id") + 100000L).count()
      hits.toDouble / 16
    }
    val single = twinRecall(1)
    val multi = twinRecall(4)
    assert(multi >= 0.9, s"multi-table twin recall $multi < 0.9 (single-table: $single)")
    assert(multi >= single, "adding tables must not lose candidates")
  }
}
