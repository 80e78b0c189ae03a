package graft

import org.apache.spark.sql.functions._

/** DSv2 paged-feed source (sources/v2/PagedFeed.scala): the REST-pager
  * shape as a TableProvider — partition-per-page planning, pruned read
  * schema, full content parity with the parquet truth. */
class PagedFeedSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"

  private def feed = {
    // build the page fixture through the registry query once, then read
    // the same directory directly for the plan-shape assertions
    SparkEntry.queries("q_paged_dsv2")(spark, dir).collect()
    val tmpRoot = new java.io.File(
      sys.props.getOrElse("graft.scratch.dir", sys.props("java.io.tmpdir")))
    val pageDir = tmpRoot.listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith(
        s"graft_dsv2_${spark.sparkContext.applicationId}"))
      .filter(_.getName.contains("sf0.001"))
      .head
    (pageDir,
      spark.read.format("graft-paged")
        .schema("o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, cents BIGINT")
        .option("dir", pageDir.getAbsolutePath).load())
  }

  test("one InputPartition per page: the page is the unit of parallelism") {
    val (pageDir, df) = feed
    val nPages = pageDir.listFiles().count(_.getName.endsWith(".tsv"))
    assert(nPages == math.ceil(
      spark.read.parquet(s"$dir/orders.parquet").count() / 2500.0).toInt)
    assert(df.rdd.getNumPartitions == nPages,
      s"expected $nPages page partitions, got ${df.rdd.getNumPartitions}")
  }

  test("column pruning reaches the reader: a 1-column projection parses 1 field") {
    val (_, df) = feed
    val plan = df.select("o_custkey").queryExecution.executedPlan.toString
    // the scan description prints the pruned field list
    assert(plan.contains("fields=o_custkey"),
      s"read schema not pruned to the projection:\n$plan")
    assert(!plan.contains("fields=o_orderkey,"),
      s"scan still reads the full feed schema:\n$plan")
  }

  test("full content parity with the parquet truth (every column, every row)") {
    val (_, df) = feed
    val got = df.orderBy("o_orderkey").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val want = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
      .orderBy("o_orderkey").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(got.sameElements(want))
  }

  test("null round-trip: \\N lines decode to NULL, short lines pad with NULL") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_dsv2_nulls").toFile
    try {
      val w = new java.io.PrintWriter(new java.io.File(tmp, "page-00000.tsv"), "UTF-8")
      w.println("1\t\\N\tok\t7")
      w.println("2\t5") // short line: missing trailing fields -> NULL
      w.close()
      val rows = spark.read.format("graft-paged")
        .schema("a BIGINT, b BIGINT, s STRING, c BIGINT")
        .option("dir", tmp.getAbsolutePath).load()
        .orderBy("a").collect()
      assert(rows(0).getLong(0) == 1L && rows(0).isNullAt(1) &&
        rows(0).getString(2) == "ok" && rows(0).getLong(3) == 7L)
      assert(rows(1).getLong(0) == 2L && rows(1).getLong(1) == 5L &&
        rows(1).isNullAt(2) && rows(1).isNullAt(3))
    } finally {
      tmp.listFiles().foreach(_.delete()); tmp.delete()
    }
  }
}
