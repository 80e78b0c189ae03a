package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time analytics over keyed streams: dense gap-filled grids and
  * cohort retention. Both are pure compositions of shuffled hash
  * aggregates and co-partitioned joins — no windows over the raw event
  * stream, no driver-side time loops.
  */
object TimeSeries {

  /** Dense per-key time grid: one row per (key, bucket) for EVERY bucket
    * between the key's first and last event, with the per-bucket event
    * count zero-filled where no events landed (resampling / gap fill).
    *
    * Bucket ids are integer floor-divisions of the micros timestamp —
    * exact long arithmetic (a double division corrupts micros near
    * 2^53). The grid is generated per key with `sequence` + `explode`
    * (map-side, bounded by the key's own span — no global calendar
    * table), and the counts join is co-partitioned on (key, bucket).
    * At 100 TB the only shuffles are the two hash aggregates and the
    * slot-count join, all on the same key family.
    *
    * @param tsUs event-time column in epoch MICROSECONDS (long)
    */
  def denseCounts(df: DataFrame, key: String, tsUs: Column, bucketUs: Long): DataFrame = {
    require(bucketUs > 0, "bucketUs must be positive")
    val base = df.select(col(key).as("__k"), tsUs.cast("long").as("__us"))
      .withColumn("__b", expr(s"__us DIV ${bucketUs}L"))
    val counts = base.groupBy("__k", "__b").agg(count(lit(1)).as("n_events"))
    val span = base.groupBy("__k").agg(min("__b").as("__b0"), max("__b").as("__b1"))
    val slots = span.select(col("__k"), explode(sequence(col("__b0"), col("__b1"))).as("__b"))
    slots.join(counts, Seq("__k", "__b"), "left")
      .select(col("__k").as(key), col("__b").as("bucket_id"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
  }

  /** Cohort retention: assign each key to the date of its first event
    * (the cohort), then count distinct keys active at each day offset
    * from their cohort date. Two hash aggregates and one co-partitioned
    * join on the key — the classic retention-matrix shape, computed
    * without a per-cohort loop.
    *
    * @param dateCol event DATE column (already timezone-resolved)
    */
  def cohortRetention(df: DataFrame, key: String, dateCol: Column): DataFrame = {
    val ev = df.select(col(key).as("__k"), dateCol.as("__d"))
    val cohort = ev.groupBy("__k").agg(min("__d").as("__c"))
    ev.join(cohort, "__k")
      .groupBy(date_format(col("__c"), "yyyy-MM-dd").as("cohort_date"),
        datediff(col("__d"), col("__c")).cast("int").as("day_offset"))
      .agg(countDistinct(col("__k")).as("n_users"))
  }
}
