package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash near-duplicate fingerprinting.
  *
  * Classic Charikar scheme: each token hashes to 64 bits; bit j of the
  * document fingerprint is the sign of Σ_tokens (±1 per token depending on
  * the token-hash's bit j). Hamming-close fingerprints ⇒ similar token
  * multisets.
  *
  * Token hashes are materialized ONCE per document (a projection the
  * optimizer keeps — CollapseProject refuses to inline a non-cheap
  * expression referenced 64 times), so the 64 per-bit votes traverse a
  * precomputed long array instead of re-hashing every token per bit.
  *
  * Candidate generation uses the pigeonhole blocking standard for simhash
  * dedup: split the 64-bit fingerprint into `chunks` 16-bit chunks; any
  * pair within hamming distance `chunks - 1` must agree on at least one
  * chunk, so an equi-join per chunk finds all of them — hash-partitioned
  * on the chunk value, never all-pairs.
  */
object SimHash {

  /** 64-bit hash per token — computed once, voted on 64 times. */
  def tokenHashes(tokensCol: Column): Column = transform(tokensCol, t => xxhash64(t))

  /** Per-bit vote over precomputed token hashes: +1 / -1 per token for
    * bit j, summed via a higher-order aggregate (codegen'd, no UDF). */
  private def bitVote(hashesCol: Column, j: Int): Column =
    aggregate(hashesCol, lit(0L),
      (acc, h) => acc + when(shiftright(h, j).bitwiseAND(1) === 1L, 1L).otherwise(-1L))

  /** 64-bit simhash fingerprint from precomputed token hashes. */
  def simhashFromHashes(hashesCol: Column): Column =
    (0 until 64).map { j =>
      when(bitVote(hashesCol, j) > 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))

  /** 64-bit simhash fingerprint of a token array. Prefer materializing
    * `tokenHashes` in a prior projection and calling `simhashFromHashes`
    * so the hashing isn't repeated per bit. */
  def simhash(tokensCol: Column): Column = simhashFromHashes(tokenHashes(tokensCol))

  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** 16-bit chunk `i` (0..3) of a 64-bit fingerprint. */
  def chunk(fp: Column, i: Int): Column =
    shiftright(fp, i * 16).bitwiseAND(0xffffL)

  /** Document fingerprints as a DataFrame: a single native-expression
    * projection (one hash + vote loop per document, no explode/shuffle).
    * This is the form to use on a corpus; the Column-based `simhash`
    * remains for expression-level composition.
    *
    * @param sqlReplicable use the universal-hash fingerprint
    *   (`NativeText.simhash_univ`) that an external SQL engine can
    *   recompute exactly — for oracle checks and cross-engine dedup;
    *   default is the faster XXH64 form
    */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
                   sqlReplicable: Boolean = false): DataFrame = {
    val fp = if (sqlReplicable) graft.functions.NativeText.simhash_univ(col(textCol))
             else graft.functions.NativeText.simhash64(col(textCol))
    docs.select(col(idCol), fp.as("fp"))
  }

  /** Near-dup pairs with hamming distance <= maxHamming (must be
    * < chunks for the pigeonhole guarantee; default 3 with 4 chunks).
    *
    * @param maxBucketSize skew guard, same as MinHashLSH: a hot chunk
    *                      value (e.g. thousands of near-empty docs with
    *                      identical fingerprints) would otherwise go
    *                      quadratic in one join task
    */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3, chunks: Int = 4,
                   maxBucketSize: Int = 1000,
                   sqlReplicable: Boolean = false): DataFrame = {
    require(maxHamming < chunks, "pigeonhole blocking needs maxHamming < chunks")
    val fps = fingerprints(docs, idCol, textCol, sqlReplicable)

    val exploded = fps.select(col(idCol), col("fp"),
      explode(array((0 until chunks).map { i =>
        struct(lit(i).as("ci"), chunk(col("fp"), i).as("cv"))
      }: _*)).as("c"))
      .select(col(idCol), col("fp"), col("c.ci"), col("c.cv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val sizes = exploded.groupBy("ci", "cv").count()
      .filter(col("count").between(2, maxBucketSize))
      .select("ci", "cv")
    val pruned = exploded.join(sizes, Seq("ci", "cv"))

    val a = pruned.select(col("ci"), col("cv"), col(idCol).as("id_a"), col("fp").as("fp_a"))
    val b = pruned.select(col("ci"), col("cv"), col(idCol).as("id_b"), col("fp").as("fp_b"))
    a.join(b, Seq("ci", "cv"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), hamming(col("fp_a"), col("fp_b")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }
}
