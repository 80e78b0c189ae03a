package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the memory-bounded ANN representation
  * (Jégou, Douze & Schmid, "Product Quantization for Nearest Neighbor
  * Search", TPAMI 2011): split each d-dim vector into `m` subvectors,
  * k-means each subspace into `ksub` centroids, and store a vector as
  * `m` small codes. A 64-dim float vector (256 bytes) becomes m=4
  * bytes — a 100-TB embedding corpus compresses to ~1.5 TB of codes
  * that fit a fraction of cluster RAM, which is the entire point: the
  * scan-side working set shrinks ~64×, and distance evaluation against
  * the reconstruction (asymmetric distance, ADC) touches only codes +
  * a broadcast codebook.
  *
  * Scale shapes: training reuses [[IvfIndex.trainReplicable]] per
  * subspace (fixed-point Lloyd — deterministic, SQL-replayable,
  * sampled); encoding is a MAP-ONLY projection (m native
  * `nearest_cells` calls per row, no shuffle); search reconstructs
  * per-code centroids from a broadcast literal codebook and reuses the
  * bounded-heap top-k (no window, no global sort). Train / encode /
  * search separate cleanly: at 100 TB you train on a sample, persist
  * the codes table, and amortize both across every query batch.
  */
object PqIndex {

  /** Per-subspace codebooks: `[m][ksub][d/m]`. Deterministic and
    * external-engine-replayable (systematic sample, id-ordered init,
    * fixed-point component sums — see IvfIndex.trainReplicable). */
  def trainReplicable(corpus: DataFrame, idCol: String, vecCol: String,
                      m: Int, ksub: Int, iters: Int = 2,
                      sampleMod: Int = 2): Array[Array[Array[Double]]] = {
    val head = corpus.select(size(col(vecCol))).limit(1).collect()
    require(head.nonEmpty, "PQ training needs a non-empty corpus")
    val dim = head.head.getInt(0)
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val dsub = dim / m
    val cbs = (0 until m).toArray.map { j =>
      val sub = corpus.select(col(idCol),
        slice(col(vecCol), j * dsub + 1, dsub).as("__sub"))
      IvfIndex.trainReplicable(sub, idCol, "__sub", ksub, iters, sampleMod)
    }
    // a sample smaller than ksub silently yields a truncated codebook —
    // stored codes would then mean different cells than callers assume
    require(cbs.forall(_.length == ksub),
      s"training sample too small for $ksub centroids " +
        s"(got ${cbs.map(_.length).min}; lower sampleMod or ksub)")
    cbs
  }

  /** Encode vectors to (id, codes array<int>): per subspace, the index
    * of the nearest codebook centroid. One map-only projection — m
    * primitive loops per row, no join, no shuffle. */
  def encode(vectors: DataFrame, idCol: String, vecCol: String,
             codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val dsub = codebooks.head.head.length
    val codeCols: Seq[Column] = codebooks.toSeq.zipWithIndex.map { case (cb, j) =>
      element_at(graft.functions.NativeVec.nearest_cells(
        slice(col(vecCol), j * dsub + 1, dsub), cb, 1), 1)
    }
    vectors.select(col(idCol), array(codeCols: _*).as("codes"))
  }

  /** Decode codes back to the reconstructed vector (the concatenation of
    * each subspace's chosen centroid). The codebook rides as a broadcast
    * 3-D literal — map-only, nothing corpus-sized on the driver. */
  def reconstruct(encoded: DataFrame, idCol: String,
                  codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val cb = typedlit(codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    encoded.select(col(idCol),
      flatten(transform(sequence(lit(0), lit(codebooks.length - 1)),
        j => element_at(element_at(cb, j + 1),
          element_at(col("codes"), j + 1) + 1))).as("recon"))
  }

  /** Asymmetric-distance top-k: exact query vector vs reconstructed
    * corpus — mathematically ADC, expressed by reusing the partial
    * top-k scan over the decoded codes. Queries broadcast (small by
    * contract); ranking on the 6dp-rounded cosine with id tie-break
    * matches the house ANN ordering. */
  def adcTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              codebooks: Array[Array[Array[Double]]],
              qIdCol: String = "q_id", idCol: String = "vec_id",
              vecCol: String = "embedding",
              roundTo: Option[Int] = Some(6)): DataFrame = {
    val recon = reconstruct(encode(corpus, idCol, vecCol, codebooks), idCol, codebooks)
      .withColumnRenamed("recon", vecCol)
    Similarity.bruteForceTopK(
      queries.select(col(qIdCol), col(vecCol).cast("array<double>").as(vecCol)),
      recon, k, qIdCol, idCol, vecCol, excludeSelf = true, roundTo = roundTo)
  }
}
