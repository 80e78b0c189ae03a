package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbour — the scale path
  * beyond hyperplane LSH: a k-means coarse quantizer partitions the
  * corpus into `nlist` cells; a query probes only its `nprobe` closest
  * cells, touching ~nprobe/nlist of the corpus.
  *
  * Scale design: the corpus-side assignment is a broadcast
  * nested-loop against `nlist` centroids (|D|·nlist work, map-only —
  * NOT |D|²) followed by one min_by aggregation; probing is an equi-join
  * on the cell id, hash-partitioned — a cell is the shuffle key, so a
  * 1000-executor probe moves only the probed cells. Train/assign/probe
  * are separable: at 100 TB you train on a sample, persist the
  * assignment as a bucketed table, and amortize it across queries.
  */
object IvfIndex {

  private def sqDist(a: Column, b: Column): Column =
    graft.functions.NativeVec.sq_dist(a, b)

  private def asDouble(v: Column): Column = transform(v, _.cast("double"))

  /** K-means centroids of the corpus (deterministic: fixed seed).
    *
    * @param sampleFraction train the quantizer on a seeded sample — a
    *   coarse quantizer needs cluster SHAPE, not every point, so at
    *   100 TB you train on a thin sample and amortize; quality loss is
    *   recall-tunable via nprobe. 1.0 = full corpus.
    */
  def train(corpus: DataFrame, vecCol: String, nlist: Int, seed: Long = 42L,
            maxIter: Int = 5, sampleFraction: Double = 1.0): Array[Array[Double]] = {
    require(sampleFraction > 0.0 && sampleFraction <= 1.0)
    val src =
      if (sampleFraction < 1.0) corpus.sample(withReplacement = false, sampleFraction, seed)
      else corpus
    val feat = src.select(
      array_to_vector(src(vecCol).cast("array<double>")).as("__features"))
    // random init: kmeans|| init runs several extra distributed passes
    // that dominate training time at moderate nlist; quantizer quality
    // is recall-tunable via nprobe anyway
    new KMeans().setK(nlist).setSeed(seed).setMaxIter(maxIter)
      .setInitMode("random")
      .setFeaturesCol("__features")
      .fit(feat).clusterCenters.map(_.toArray)
  }

  /** Centroids as a broadcastable (cid, cvec) frame. */
  def centroidFrame(df: DataFrame, centroids: Array[Array[Double]]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    centroids.zipWithIndex.toSeq.map { case (c, i) => (i, c.toSeq) }
      .toDF("cid", "cvec")
  }

  /** Cell assignment: nearest centroid per vector. Broadcast NLJ over
    * nlist centroids + one min_by aggregation on the vector id. */
  def assign(vectors: DataFrame, idCol: String, vecCol: String,
             cents: DataFrame): DataFrame =
    vectors.select(col(idCol), asDouble(col(vecCol)).as("__v"))
      .crossJoin(broadcast(cents))
      .select(col(idCol), col("cid"), sqDist(col("__v"), col("cvec")).as("__d"))
      .groupBy(col(idCol))
      .agg(expr("min_by(cid, __d)").as("cid"))

  /** Approximate top-k: each query probes its `nprobe` closest cells.
    *
    * @param queries        (qIdCol, vecCol) — small, broadcastable
    * @param corpus         (idCol, vecCol)
    * @param sampleFraction quantizer training sample (see [[train]]) —
    *                       ignored when `centroids` are supplied
    * @param centroids      precomputed quantizer: pass the result of a
    *                       prior [[train]] to amortize training across
    *                       query batches (the persisted-assignment path
    *                       at scale — train once, probe repeatedly)
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nlist: Int, nprobe: Int,
              qIdCol: String = "q_id", idCol: String = "vec_id",
              vecCol: String = "embedding", seed: Long = 42L,
              sampleFraction: Double = 1.0,
              centroids: Option[Array[Array[Double]]] = None): DataFrame = {
    require(nprobe >= 1 && nprobe <= nlist)
    val cs = centroids.getOrElse(
      train(corpus, vecCol, nlist, seed, sampleFraction = sampleFraction))
    val cents = centroidFrame(corpus, cs)

    val corpusCells = assign(corpus, idCol, vecCol, cents)
      .join(corpus.select(col(idCol), col(vecCol).as("__cv")), Seq(idCol))

    val probeRank = Window.partitionBy(qIdCol).orderBy(col("__d"), col("cid"))
    val queryProbes = queries
      .select(col(qIdCol), asDouble(col(vecCol)).as("__qvd"), col(vecCol).as("__qv"))
      .crossJoin(broadcast(cents))
      .select(col(qIdCol), col("__qv"), col("cid"), sqDist(col("__qvd"), col("cvec")).as("__d"))
      .withColumn("__pr", row_number().over(probeRank))
      .filter(col("__pr") <= nprobe)
      .select(col(qIdCol), col("__qv"), col("cid"))

    val scored = broadcast(queryProbes).join(corpusCells, Seq("cid"))
      .filter(col(qIdCol) =!= col(idCol))
      .select(col(qIdCol), col(idCol),
        Similarity.cosine(col("__qv"), col("__cv")).as("cosine"))
    Similarity.topK(scored, qIdCol, idCol, "cosine", k)
  }
}
