package graft

import org.apache.spark.sql.functions._

class ApproxDistinctSpec extends GraftSuite {

  test("HLL++ distinct is within its error bound of the exact count") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .withColumn("wave", col("o_orderkey") % 10)
    val both = orders.groupBy("wave")
      .agg(approx_count_distinct(col("o_custkey"), rsd = 0.02).as("approx"),
        countDistinct(col("o_custkey")).as("exact"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val (a, e) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(a - e) / e <= 0.10,
        s"wave ${r.get(0)}: approx $a too far from exact $e")
    }
  }

  test("the sketch aggregates map-side (partial + final HashAggregate)") {
    val plan = SparkEntry.queries("q_approx_distinct")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert("HashAggregate".r.findAllIn(plan).size >= 2, s"no partial agg:\n$plan")
  }
}
