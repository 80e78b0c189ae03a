package graft

import org.apache.spark.sql.functions._

/** Write-side scale behaviors: partitioned layout + partition pruning. */
class WritePathSpec extends GraftSuite {

  test("partitionBy write → read-back prunes partitions at the scan") {
    val out = "target/orders_by_wave"
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .withColumn("wave", col("o_orderkey") % 10)
      .write.mode("overwrite").partitionBy("wave").parquet(out)

    val pruned = spark.read.parquet(out).filter(col("wave") === 3)
    val fmt = pruned.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(fmt.contains("PartitionFilters") && fmt.contains("wave"),
      s"partition filter did not reach the scan:\n$fmt")
    // only the wave=3 directory is read
    assert(pruned.count() ==
      spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .filter(col("o_orderkey") % 10 === 3).count())
    val files = pruned.select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains("wave=3")),
      s"read touched non-matching partitions: ${files.toSeq}")
  }

  test("writer parallelism follows the frame's partitioning (no single-file funnel)") {
    val out = "target/orders_multi"
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .repartition(4)
      .write.mode("overwrite").parquet(out)
    val parts = new java.io.File(out).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parts == 4, s"expected 4 output files, got $parts")
  }
}
