package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation.
  *
  * `df.sample()` draws from partition-seeded RNG streams: the kept set
  * changes with partitioning, is irreproducible outside Spark, and
  * can't be re-derived later ("was this doc in the mixture?"). The
  * curation-grade alternative is SYSTEMATIC sampling on a deterministic
  * hash bucket of the id: membership is a pure function of the row,
  * identical on any engine, stable under repartitioning, and a row's
  * inclusion can be audited after the fact.
  *
  * Bucket function: an LCG step over the id with a pre-mod that keeps
  * every intermediate below 2^63 — wrap-around never happens, so
  * engines that ERROR on BIGINT overflow (rather than wrap like the
  * JVM) compute the identical bucket. All map-only, codegen'd
  * arithmetic — no RNG state, no shuffle.
  */
object Sampling {

  /** Pre-mod keeps `id % PreMod * A + B` < 2^63 for any long id. The
    * multiplier must be COPRIME to the bucket modulus (1000 = 2³·5³) or
    * only every gcd-th bucket is reachable and the advertised 1/1000
    * rate resolution silently degrades — hence 1103515247 (ends in 7,
    * no factor 2 or 5), not the classic LCG 1103515245 (gcd 5). */
  private val PreMod = 1000003L
  private val A = 1103515247L
  private val B = 12345L

  /** Deterministic bucket in [0, buckets) — a pure function of the id. */
  def systematicBucket(id: Column, buckets: Int): Column =
    (pmod(id, lit(PreMod)) * A + B) % buckets

  /** Keep each row of stratum s with probability ≈ rates(s) (resolution
    * 1/1000): bucket(id) < rate·1000. Unlisted strata use
    * `defaultRate`. Output keeps every input column. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       rates: Map[String, Double],
                       defaultRate: Double = 0.0): DataFrame = {
    require((rates.values.toSeq :+ defaultRate).forall(r => r >= 0.0 && r <= 1.0))
    val threshold = rates.foldLeft(lit((defaultRate * 1000).round): Column) {
      case (acc, (s, r)) => when(col(strataCol) === s, lit((r * 1000).round)).otherwise(acc)
    }
    df.filter(systematicBucket(col(idCol), 1000) < threshold)
  }
}
