package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis: per key, the earliest completion time of
  * each step, where step i+1 must happen at-or-after the earliest
  * completion of step i (the standard product-analytics funnel
  * semantics — "signed up, then viewed, then purchased").
  *
  * Scale shape: every stage is
  *   facts.filter(step predicate)  →  join frontier on key  →  min-agg
  * so the fact table is predicate-filtered BEFORE it shuffles, every
  * join and aggregation hashes on the SAME key (co-partitioned — AQE
  * reuses the exchange), and each frontier is one row per key that
  * reached the step — monotonically shrinking. No windows over the raw
  * event stream, no per-key event collection, so a key with millions of
  * events costs only its filtered step rows. Reference computes funnels
  * with a per-user Python loop (feeder.py drives row-at-a-time status
  * logic); this is the distributed re-expression.
  */
object Funnel {

  /** @param df    event-shaped input
    * @param key   funnel entity column (e.g. user_id)
    * @param tsUs  event-time column in epoch MICROSECONDS (long)
    * @param steps (outputColumn, predicate) per funnel step, in order
    * @return one row per key that completed step 1: key, one nullable
    *         long micros column per step, and `depth` = number of steps
    *         completed (int ≥ 1).
    */
  def firstCompletion(df: DataFrame, key: String, tsUs: Column,
                      steps: Seq[(String, Column)]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val base = df.select(
      (col(key) +: tsUs.cast("long").as("__t") +:
        steps.map { case (name, pred) => pred.as(s"__is_$name") }): _*)

    // Frontier i: (key, t_i) = earliest step-i event at-or-after t_{i-1}.
    val frontiers: Seq[DataFrame] = steps.zipWithIndex.foldLeft(Seq.empty[DataFrame]) {
      case (acc, ((name, _), i)) =>
        val stepRows = base.filter(col(s"__is_$name")).select(col(key), col("__t"))
        val frontier =
          if (i == 0) stepRows.groupBy(key).agg(min("__t").as(name))
          else {
            val prevName = steps(i - 1)._1
            val prev = acc.last.select(col(key), col(prevName))
            stepRows.join(prev, key)
              .filter(col("__t") >= col(prevName))
              .groupBy(key).agg(min("__t").as(name))
          }
        acc :+ frontier
    }

    val assembled = frontiers.reduceLeft((l, r) => l.join(r, Seq(key), "left"))
    // depth = highest non-null step; steps are sequential so nulls only
    // trail (step i+1's frontier joins step i's keys).
    // Forward fold so the HIGHEST step's check wraps outermost:
    // when(s_n, n).otherwise(... when(s_1, 1).otherwise(0))
    assembled.withColumn("depth",
      steps.zipWithIndex.foldLeft(lit(0)) { case (acc, ((name, _), i)) =>
        when(col(name).isNotNull, lit(i + 1)).otherwise(acc)
      }.cast("int"))
  }
}
