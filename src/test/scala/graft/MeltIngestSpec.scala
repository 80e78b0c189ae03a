package graft

import org.apache.spark.sql.functions._

/** q_unpivot, q_jsonl_ingest: shape and round-trip checks on the
  * sf0.001 fixtures.
  */
class MeltIngestSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"
  private def q(key: String) = SparkEntry.queries(key)(spark, dir)

  test("unpivot doubles the row count and is an Expand, not a shuffle") {
    val n = spark.read.parquet(s"$dir/orders.parquet").count()
    val df = q("q_unpivot")
    assert(df.count() == 2 * n, "one long row per (row, metric)")
    assert(df.select("metric").distinct().collect().map(_.getString(0)).sorted.toSeq
      == Seq("o_custkey", "o_totalprice"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"unpivot must plan a map-side Expand:\n$plan")
    assert(!plan.contains("Exchange"), s"melting must not shuffle:\n$plan")
  }

  test("jsonl ingest routes exactly the corrupt lines and loses no rows") {
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val n = orders.count()
    val corrupt = orders.filter(col("o_orderkey") % 101 === 0).count()
    val out = q("q_jsonl_ingest").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.values.sum == n, "every line lands somewhere (no silent drops)")
    assert(out("_corrupt") == corrupt, s"corrupt bucket ${out("_corrupt")} != planted $corrupt")
    assert(corrupt > 0, "fixture must plant corrupt lines")
  }
}
