package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregation via algebraic partial states. A 100-TB
  * pipeline cannot rescan its whole history every load — it stores the
  * aggregate's PARTIAL state (count + sum per key, the same shape
  * Spark's own partial_sum/partial_count shuffle) and folds each new
  * delta batch into it. Count and sum are algebraic (state merge =
  * componentwise add), so merging states is itself one
  * map-side-combinable aggregate and the result is EXACTLY the
  * aggregate over history ∪ delta — which is what the oracle checks.
  *
  * Sums ride as DECIMAL inside the state: double addition is
  * order-sensitive, and a stored state must merge to the same bits no
  * matter how many increments produced it.
  */
object IncrementalAgg {

  /** Build the (key, cnt, total) partial state for one batch. */
  def state(df: DataFrame, key: String, valueCol: String): DataFrame =
    df.groupBy(col(key))
      .agg(count(lit(1)).as("cnt"),
        sum(col(valueCol).cast("decimal(18,6)")).as("total"))

  /** Merge partial states into the combined state — componentwise add
    * per key. Associative and commutative: fold deltas in any order,
    * or merge a whole day's states in one call. */
  def merge(key: String, states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "merge needs at least one state")
    states.reduce(_ unionByName _)
      .groupBy(col(key))
      .agg(sum(col("cnt")).as("cnt"), sum(col("total")).as("total"))
  }
}
