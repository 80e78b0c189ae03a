package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CDC change application — collapse a change feed (upserts + deletes)
  * onto a base snapshot in one pass. This is the general form of the
  * reference's upsert jobs (add_q5010.py:20-46 applies UPDATE-only
  * batches); a real replication feed also carries deletes, and at
  * 100 TB the feed must collapse BEFORE touching the snapshot — one
  * aggregate over the (small) feed, one join against the (huge) base,
  * never a per-change loop.
  *
  * Plan shape: the feed reduces to its last change per key with a
  * single map-side-combinable `max_by` (no window, no sort); the
  * collapsed feed then full-outer-joins the base on the key. The base
  * shuffles at most once, and when the collapsed feed is small AQE
  * turns the join into a broadcast — the snapshot never moves.
  */
object Cdc {

  /** Apply `changes` to `base`.
    *
    * `changes` rows carry the key, an op marker (`deleteOp` = delete,
    * anything else = upsert), the new values, and sequencing columns.
    * The LAST change per key by `seqCols` wins; ties beyond `seqCols`
    * break deterministically on (op, values) so duplicate sequence
    * numbers cannot flap the outcome between runs.
    *
    * Result: base rows without a change survive unchanged; a key whose
    * last change is an upsert gets the change's values (inserted if
    * absent from base); a key whose last change is a delete disappears.
    */
  def apply(base: DataFrame, changes: DataFrame, key: String,
            valueCols: Seq[String], opCol: String, seqCols: Seq[String],
            deleteOp: String = "D"): DataFrame = {
    val payload: Column = struct((opCol +: valueCols).map(col): _*)
    val ord: Column = struct((seqCols.map(col) :+ payload): _*)
    val last = changes
      .filter(col(key).isNotNull)
      .groupBy(col(key))
      .agg(max_by(payload, ord).as("__c"))
    base.join(last, Seq(key), "full_outer")
      // NULL-safe delete test: a NULL op marker is NOT deleteOp, so per
      // the contract ("anything else = upsert") it must upsert — a bare
      // `=!=` would evaluate NULL and silently drop the key
      .filter(col("__c").isNull || !(col("__c")(opCol) <=> deleteOp))
      .select(
        col(key) +:
          valueCols.map(v =>
            when(col("__c").isNotNull, col("__c")(v)).otherwise(col(v)).as(v)): _*)
  }
}
