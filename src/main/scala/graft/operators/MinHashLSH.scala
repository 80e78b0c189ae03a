package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate detection at scale.
  *
  * Pipeline: word shingles → H minhash values (one xxhash64 family per
  * slot, salted by slot index) → band the signature into `bands` groups of
  * `rowsPerBand` → per-band bucket key → candidate pairs via a self
  * equi-join ON (band, bucket) → exact shingle-Jaccard verify.
  *
  * Scale design: candidates are generated per-(band,bucket) — the join is
  * hash-partitioned on the bucket key, so work is Σ bucket² per band,
  * never |D|². No crossJoin anywhere; a mega-bucket (e.g. empty docs all
  * colliding) is bounded by `maxBucketSize` before pairing, the standard
  * guard against quadratic skew.
  *
  * Everything below is Catalyst higher-order functions over arrays —
  * codegen'd, no UDFs, no driver participation.
  */
object MinHashLSH {

  /** One minhash slot: min over shingles of a slot-salted 64-bit hash. */
  def minhashSlot(shingleCol: Column, slot: Int): Column =
    array_min(transform(shingleCol, s => xxhash64(lit(slot), s)))

  /** Full signature as an array column of length `numHashes`. */
  def signature(shingleCol: Column, numHashes: Int): Column =
    array((0 until numHashes).map(i => minhashSlot(shingleCol, i)): _*)

  /** (band, bucket) rows for LSH: one output row per band, bucket =
    * hash of that band's signature slice. */
  def banded(df: DataFrame, sigCol: String, bands: Int, rowsPerBand: Int): DataFrame = {
    val bandIdx = explode(sequence(lit(0), lit(bands - 1))).as("band")
    df.select(col("*"), bandIdx)
      .withColumn("bucket",
        xxhash64(col("band"), concat_ws(",",
          slice(col(sigCol), col("band") * rowsPerBand + 1, lit(rowsPerBand)))))
  }

  /** Exact Jaccard over two shingle-set arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = (size(a) + size(b)).cast("double") - inter
    when(union === 0.0, lit(1.0)).otherwise(inter / union)
  }

  /** Near-duplicate pairs (id_a < id_b, jaccard >= threshold).
    *
    * @param docs          (idCol, textCol) input
    * @param shingleK      words per shingle
    * @param numHashes     signature length = bands * rowsPerBand
    * @param maxBucketSize skew guard: buckets larger than this are dropped
    *                      from pairing (they are pathological collisions,
    *                      e.g. empty documents)
    */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                   shingleK: Int = 3, bands: Int = 8, rowsPerBand: Int = 4,
                   threshold: Double = 0.8,
                   maxBucketSize: Int = 1000): DataFrame = {
    val withShingles = docs.select(
      col(idCol), TextAnalysis.shingles(col(textCol), shingleK).as("__sh"))
    val sigs = withShingles.withColumn("__sig", signature(col("__sh"), bands * rowsPerBand))
    val bandedDf = banded(sigs, "__sig", bands, rowsPerBand)
      .select(col(idCol), col("__sh"), col("band"), col("bucket"))

    // Skew guard: count bucket sizes (one cheap agg) and keep sane buckets.
    val sizes = bandedDf.groupBy("band", "bucket").count()
      .filter(col("count").between(2, maxBucketSize))
      .select("band", "bucket")
    val pruned = bandedDf.join(sizes, Seq("band", "bucket"))

    val a = pruned.select(col("band"), col("bucket"),
      col(idCol).as("id_a"), col("__sh").as("__sh_a"))
    val b = pruned.select(col("band"), col("bucket"),
      col(idCol).as("id_b"), col("__sh").as("__sh_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        jaccard(col("__sh_a"), col("__sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .groupBy("id_a", "id_b").agg(max("jaccard").as("jaccard"))
  }

  /** n-gram Jaccard verify pass over an arbitrary candidate-pair set
    * (id_a, id_b): joins text back and scores exact Jaccard. Used both as
    * MinHash's verify stage and standalone over any blocking scheme. */
  def verifyPairs(pairs: DataFrame, docs: DataFrame, idCol: String,
                  textCol: String, shingleK: Int): DataFrame = {
    val sh = docs.select(col(idCol),
      TextAnalysis.shingles(col(textCol), shingleK).as("__sh"))
    pairs
      .join(sh.withColumnRenamed(idCol, "id_a").withColumnRenamed("__sh", "__sh_a"), Seq("id_a"))
      .join(sh.withColumnRenamed(idCol, "id_b").withColumnRenamed("__sh", "__sh_b"), Seq("id_b"))
      .select(col("id_a"), col("id_b"), jaccard(col("__sh_a"), col("__sh_b")).as("jaccard"))
  }
}
