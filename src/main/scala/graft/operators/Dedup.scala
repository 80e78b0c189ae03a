package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dedup operators.
  *
  * The reference fetches every existing phone number to the driver into a
  * Python list and does `phone in existing_phone_numbers` per row
  * (feeder.py:140-143, 157-160) — a driver OOM at scale. Here both sides
  * stay distributed: the membership test is a `left_anti` join, and the
  * skipped-set report (feeder.py:245-246) is the complementary
  * `left_semi`. When the existing-keys side is small Spark broadcasts it
  * (AQE or the explicit hint below); otherwise it is a shuffled hash join
  * partitioned on the key — either way no row set ever lands on the
  * driver.
  */
object Dedup {

  /** Rows of `incoming` whose `key` is NOT present in `existing` —
    * the rows the feeder actually inserts (feeder.py:157-160). */
  def newRows(incoming: DataFrame, existing: DataFrame, key: String,
              broadcastExisting: Boolean = false): DataFrame = {
    val keys = existing.select(col(key)).distinct()
    val right = if (broadcastExisting) broadcast(keys) else keys
    incoming.join(right, Seq(key), "left_anti")
  }

  /** The skipped-keys report (feeder.py:245-246): rows whose key already
    * exists. */
  def skippedRows(incoming: DataFrame, existing: DataFrame, key: String): DataFrame =
    incoming.join(existing.select(col(key)).distinct(), Seq(key), "left_semi")

  /** Exact dedup over a derived fingerprint: one surviving row id per
    * fingerprint (keep the minimum of `idCol`), plus the group size.
    * A single hash-partitioned aggregation — map-side partial min/count,
    * no window, no sort; survives arbitrary scale. */
  def exactByFingerprint(df: DataFrame, fingerprint: String, idCol: String): DataFrame =
    df.groupBy(col(fingerprint))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dupes"))

  /** Exact dedup keeping whole surviving rows: semi-join the winners back.
    * Two shuffles on the same key (Catalyst reuses the exchange). */
  def exactRows(df: DataFrame, fingerprint: String, idCol: String): DataFrame = {
    val winners = exactByFingerprint(df, fingerprint, idCol)
      .select(col("keep_id").as(idCol))
    df.join(winners, Seq(idCol), "left_semi")
  }
}
