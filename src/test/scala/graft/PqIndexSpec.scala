package graft

import org.apache.spark.sql.functions._

import graft.operators.{PqIndex, Similarity}

class PqIndexSpec extends GraftSuite {
  import spark.implicits._

  // sf0.01: 500 vectors — sf0.001's 50 are too few to train 16 centroids
  // per subspace (quantizer quality is a training-data property, not a
  // code property)
  private val dir = "/root/testdata/sf0.01"
  private def embeddings = spark.read.parquet(s"$dir/embeddings.parquet")

  private lazy val cbs = PqIndex.trainReplicable(
    embeddings, "vec_id", "embedding", m = 8, ksub = 16, iters = 3, sampleMod = 1)

  test("codebooks have the declared shape and training is deterministic") {
    assert(cbs.length == 8 && cbs.forall(_.length == 16) &&
      cbs.forall(_.forall(_.length == 8))) // 64 dims / 8 subspaces
    val again = PqIndex.trainReplicable(
      embeddings, "vec_id", "embedding", m = 8, ksub = 16, iters = 3, sampleMod = 1)
    assert(cbs.flatten.flatten.toSeq == again.flatten.flatten.toSeq)
  }

  test("encode is a map-only projection with in-range codes") {
    val enc = PqIndex.encode(embeddings, "vec_id", "embedding", cbs)
    val plan = enc.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("exchange") && !plan.contains("Join"),
      s"encode must be map-only:\n$plan")
    val codes = enc.select(explode(col("codes"))).as[Int].collect()
    assert(codes.nonEmpty && codes.forall(c => c >= 0 && c < 16))
    // one code per subspace (m = 8) for every vector
    assert(enc.filter(size(col("codes")) =!= 8).count() == 0)
  }

  test("reconstruction preserves geometry (high cosine to the original)") {
    val enc = PqIndex.encode(embeddings, "vec_id", "embedding", cbs)
    val recon = PqIndex.reconstruct(enc, "vec_id", cbs)
    val meanCos = embeddings.join(recon, "vec_id")
      .select(avg(Similarity.cosine(
        col("embedding").cast("array<double>"), col("recon"))))
      .first().getDouble(0)
    // the synthetic embeddings are near-isotropic — PQ's worst case (no
    // cluster structure to exploit); real embedding corpora sit well
    // above this floor
    assert(meanCos > 0.55, s"mean reconstruction cosine $meanCos too low")
  }

  test("ADC top-k recalls most exact neighbours") {
    val queries = embeddings.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding"))
    val exact = Similarity.bruteForceTopK(queries, embeddings, k = 10,
      roundTo = Some(6)).select("q_id", "vec_id")
    val pq = PqIndex.adcTopK(queries, embeddings, k = 30, cbs)
      .select("q_id", "vec_id")
    val hits = exact.join(pq, Seq("q_id", "vec_id")).count()
    val total = exact.count()
    assert(total == 80)
    // 0.61 measured; random selection of 30 from 499 would recall ~6%
    assert(hits.toDouble / total > 0.5, s"recall ${hits.toDouble / total}")
  }
}
