package graft

import org.apache.spark.sql.functions._

/** q_hll_union, q_trigram_search: the sketch-merge contract and the
  * trigram index's candidate-superset property on the sf0.001 fixtures.
  */
class SketchUnionSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"
  private def q(key: String) = SparkEntry.queries(key)(spark, dir)

  // -------------------------------------------------------------- hll union

  test("hll union matches direct sketch and stays within 5% of exact") {
    val r = q("q_hll_union").head()
    assert(r.getLong(0) == 10, "ten waves")
    assert(r.getBoolean(2), "union-of-waves must track the direct sketch")
    assert(r.getBoolean(3), "union estimate must stay within 5% of exact")
  }

  test("hll sketches survive a parquet round-trip and still merge") {
    // the STORE half of store-and-merge: binary sketches written to
    // parquet, read back, unioned — same estimate as the in-memory union
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val waves = orders.withColumn("wave", col("o_orderkey") % 10)
      .groupBy("wave").agg(hll_sketch_agg(col("o_custkey")).as("sk"))
    val dirOut = new java.io.File("target/hll_union_spec").getAbsolutePath
    waves.write.mode("overwrite").parquet(dirOut)
    def est(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(hll_sketch_estimate(hll_union_agg(col("sk")))).head().getLong(0)
    assert(est(spark.read.parquet(dirOut)) == est(waves),
      "stored sketches must union to the same estimate")
  }

  // -------------------------------------------------------- trigram search

  test("trigram search equals the plain contains scan (index changes cost, not semantics)") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase)
    val expected = (for {
      p <- Seq("join merge", "scan filter")
      (id, txt) <- docs if txt.contains(p)
    } yield (p, id)).toSet
    val got = q("q_trigram_search").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == expected,
      s"index result must equal the scan: extra=${got -- expected} missing=${expected -- got}")
    assert(expected.nonEmpty, "patterns must occur in the fixture corpus")
  }

  test("trigram pattern join broadcasts (the pattern side is tiny by construction)") {
    val plan = q("q_trigram_search").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"pattern trigrams must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"no all-pairs scan in the trigram route:\n$plan")
  }
}
