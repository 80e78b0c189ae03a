package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed global prefix sum — the scan primitive behind sequence
  * packing, offset assignment, and file-splitting in a training-data
  * pipeline.
  *
  * The naive Spark form, `sum(x) OVER (ORDER BY k ROWS UNBOUNDED
  * PRECEDING)`, is an unpartitioned window: every row funnels through
  * ONE reducer — the canonical scale-killer. This is the classic
  * two-phase scan instead:
  *
  *   1. range-partition on the order key + sort within partitions
  *      (global order, no global sort);
  *   2. pass 1: per-partition totals → the driver scans them into
  *      per-partition starting offsets (O(partitions) driver memory);
  *   3. pass 2: map-side `offset + local running sum` per row.
  *
  * Both passes MUST reuse the one shuffled lineage (same rule as
  * PagedReader.pageBoundsDistributed): rebuilding the pipeline per pass
  * could sample different range bounds.
  *
  * `orderCol` must be unique — with duplicate keys the relative order
  * of equal keys (and so their running totals) is partition-placement
  * dependent.
  */
object PrefixSum {

  /** @return (orderCol, valueCol as long, running_total) where
    *         running_total is the INCLUSIVE prefix sum in `orderCol`
    *         order; null values count as 0 */
  def runningTotal(df: DataFrame, orderCol: String, valueCol: String): DataFrame = {
    val spark = df.sparkSession
    val parts = math.max(spark.sparkContext.defaultParallelism, 1)
    val keyed = df.select(col(orderCol).as("__k"),
        coalesce(col(valueCol).cast("long"), lit(0L)).as("__x"))
      .repartitionByRange(parts, col("__k"))
      .sortWithinPartitions("__k")
      .rdd.map(r => (r.get(0), r.getLong(1)))
    val partSums = keyed
      .mapPartitionsWithIndex((i, it) => Iterator((i, it.map(_._2).sum)))
      .collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _)
    val rows = keyed.mapPartitionsWithIndex { (i, it) =>
      var run = offsets(i)
      it.map { case (k, x) => run += x; Row(k, x, run) }
    }
    val schema = StructType(Seq(
      df.schema(orderCol).copy(name = orderCol),
      StructField(valueCol, LongType, nullable = false),
      StructField("running_total", LongType, nullable = false)))
    spark.createDataFrame(rows, schema)
  }

  /** Sequence packing: assign each document to a fixed-token-budget bin
    * by its starting offset in the global token stream — `pack_id =
    * (running_total - n_tokens) div budget`. Deterministic (id-ordered),
    * one distributed scan, no single-reducer window; downstream
    * repartitioning on pack_id co-locates each bin's documents. */
  def packByBudget(docs: DataFrame, idCol: String, tokensCol: String,
                   budget: Long): DataFrame = {
    require(budget > 0)
    // integer `div`, not `/`: Column `/` is double division, and a
    // 100-TB token total exceeds 2^53 where double floor goes inexact
    runningTotal(docs, idCol, tokensCol)
      .select(col(idCol), col(tokensCol),
        expr(s"(running_total - $tokensCol) div $budget").as("pack_id"))
  }
}
