package graft

import org.apache.spark.sql.functions._

/** SURVEY §5 claim check: pre-bucketing both join sides on the join key
  * lets the join run with NO shuffle exchange — the co-located join
  * strategy for repeated large-table joins at scale. */
class BucketedJoinSpec extends GraftSuite {

  test("join of two tables bucketed on the key runs without a shuffle") {
    val dir = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    // the in-memory catalog forgets tables between JVMs but the managed
    // locations survive on disk — clear them so saveAsTable can recreate
    Seq("b_orders", "b_customer").foreach { t =>
      val loc = new java.io.File(s"target/spark-warehouse/$t")
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    spark.read.parquet(s"$dir/orders.parquet")
      .write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
      .format("parquet").saveAsTable("b_orders")
    spark.read.parquet(s"$dir/customer.parquet")
      .withColumn("c_custkey", col("c_custkey")) // bucket key must match type
      .write.mode("overwrite").bucketBy(8, "c_custkey").sortBy("c_custkey")
      .format("parquet").saveAsTable("b_customer")

    // disable auto-broadcast so the join would OTHERWISE shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"),
          col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == spark.read.parquet(s"$dir/orders.parquet").count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  test("q_bucketed_join registry query passes its own no-shuffle guard") {
    // the query `require`s a shuffle-free join plan internally — reaching
    // collect() proves the co-location contract held
    val rows = SparkEntry.queries("q_bucketed_join")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length == 5, "one row per order priority")
    assert(rows.forall(_.getDouble(2) > 0.0))
  }
}
