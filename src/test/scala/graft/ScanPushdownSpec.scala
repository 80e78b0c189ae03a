package graft

import org.apache.spark.sql.functions._

/** q_stats_pushdown, q_partitioned_scan, q_cube: the point of the first
  * two IS the plan shape (footer-only aggregation, planning-time
  * partition pruning) — assert it, not just the values. */
class ScanPushdownSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"
  private def q(key: String) = SparkEntry.queries(key)(spark, dir)

  test("stats query pushes the aggregate into the parquet scan (footer-only I/O)") {
    val df = q("q_stats_pushdown")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregation: [COUNT(*)"),
      s"aggregate must reach the scan:\n$plan")
    val row = df.head()
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    assert(row.getLong(0) == orders.count())
    assert(row.getDouble(1) == orders.agg(min("o_totalprice")).head().getDouble(0))
  }

  test("partitioned scan prunes to the one wave directory at planning time") {
    val df = q("q_partitioned_scan")
    val plan = df.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*\\(wave#\\d+ = 3\\)".r.findFirstIn(plan).isDefined,
      s"wave filter must prune partitions at planning time:\n$plan")
    assert(!plan.contains("PushedFilters: [IsNotNull(wave)"),
      s"wave must not appear as a data filter (it is a directory, not a column):\n$plan")
    // the pruned file list really is one wave directory
    val scan = df.queryExecution.sparkPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    val files = scan.relation.location.listFiles(scan.partitionFilters, scan.dataFilters)
      .flatMap(_.files).map(_.getPath.toString)
    assert(files.nonEmpty && files.forall(_.contains("wave=3")),
      s"only the wave=3 directory may be read: ${files.take(3).mkString(", ")}")
  }

  test("cube produces all four lattice levels; the grand total covers the table") {
    val rows = q("q_cube").collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)), r.getLong(2)))
    val levels = rows.map { case (a, b, _) => (a.isDefined, b.isDefined) }.toSet
    assert(levels == Set((true, true), (true, false), (false, true), (false, false)),
      s"missing lattice level: $levels")
    val total = spark.read.parquet(s"$dir/orders.parquet").count()
    assert(rows.collect { case (None, None, n) => n }.toSeq == Seq(total))
    // each level partitions the table
    Seq[((Option[String], Option[String])) => Boolean](
      { case (a, b) => a.isDefined && b.isDefined },
      { case (a, b) => a.isDefined && b.isEmpty },
      { case (a, b) => a.isEmpty && b.isDefined }
    ).foreach { lvl =>
      assert(rows.filter(r => lvl((r._1, r._2))).map(_._3).sum == total)
    }
  }
}
