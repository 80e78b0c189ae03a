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
      .config("spark.sql.warehouse.dir", "target/spark-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

abstract class GraftSuite extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  /** The events table with `ts` normalized to TimestampType — same
    * contract as the main loader (Queries.events): µs-encoded files
    * (TIMESTAMP_NTZ under UTC session tz) cast straight through;
    * legacy TIMESTAMP(NANOS) files read as long nanos under the
    * legacy flag and truncate to micros. */
  def eventsTable(dir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    def read() = spark.read.parquet(s"$dir/events.parquet")
    val raw =
      try read()
      catch {
        case e: Exception if e.getMessage != null && e.getMessage.contains("NANOS") =>
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          read()
      }
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
}
