package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole test run. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // typed-imperative aggregates (TopKAggregate & co) hold BOUNDED
      // per-key state; Spark's 128-key ObjectHashAggregate fallback
      // would otherwise sort the whole pre-agg stream to disk (the
      // sf100 q_knn_graph spill killer — 8e9 joined rows hit the sorter)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
      .config("spark.sql.warehouse.dir", "target/spark-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

abstract class GraftSuite extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  /** The events table with `ts` normalized to TimestampType — THE
    * loader the queries use (Queries.events), not a copy: the spec
    * replays must see bit-identical rows to the queries under every
    * encoding the loader adapts to. */
  def eventsTable(dir: String): org.apache.spark.sql.DataFrame =
    Queries.events(spark, dir)
}
