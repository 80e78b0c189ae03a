package graft

import org.apache.spark.sql.functions._

/** Explain-audits: the plans we'd want at 100 TB, asserted at test scale.
  * Uses the sf0.001 parquet fixtures. */
class PlanSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"
  private def q(key: String) = SparkEntry.queries(key)(spark, dir)

  test("q_pushdown_filter: predicate and projection reach the parquet scan") {
    val fmt = q("q_pushdown_filter").queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(fmt.contains("PushedFilters: ["), s"no pushed filters:\n$fmt")
    assert(fmt.contains("o_orderdate"), s"filter column missing from scan:\n$fmt")
    // projection pruned to the 3 selected cols + filter col
    assert(!fmt.contains("o_orderpriority"), s"scan reads unprojected columns:\n$fmt")
  }

  test("q_paged_ingest pages by key-range pushdown, not a global window") {
    val df = q("q_paged_ingest")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"pager must not rank the whole table through one window task:\n$plan")
    val fmt = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(fmt.contains("PushedFilters: [IsNotNull(o_orderkey), GreaterThanOrEqual(o_orderkey"),
      s"page bounds must reach the scan as pushed predicates:\n$fmt")
  }

  test("q_feeder_load: dim join and existing-keys dedup are broadcast, not shuffled") {
    val plan = q("q_feeder_load").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$plan")
    assert(!plan.contains("Cartesian"))
  }

  test("whole-stage codegen covers the transform suite") {
    // codegen'd operators print with a "*(stageId)" prefix in the plan tree
    val plan = q("q_status_map").queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"transforms fell out of codegen:\n$plan")
  }

  test("q_dedup_exact aggregates with partial (map-side) aggregation") {
    val plan = q("q_dedup_exact").queryExecution.executedPlan.toString
    // two HashAggregates around the exchange = partial + final
    assert("HashAggregate".r.findAllIn(plan).size >= 2, s"no partial agg:\n$plan")
    assert(!plan.contains("Cartesian"))
  }

  test("LSH dedup plans contain no cartesian product at any stage") {
    Seq("q_dedup_minhash", "q_dedup_simhash", "q_dedup_embed", "q_ann_lsh").foreach { k =>
      val plan = q(k).queryExecution.executedPlan.toString
      assert(!plan.contains("Cartesian"), s"$k has a cross join:\n$plan")
    }
  }

  test("q_batch_append repartitions for concurrent writers (no single-writer funnel)") {
    assert(q("q_batch_append").rdd.getNumPartitions == 8)
  }

  test("q_lineitem_pricing scan is pruned to the aggregated columns") {
    val fmt = q("q_lineitem_pricing").queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!fmt.contains("l_shipdate") && !fmt.contains("l_partkey"),
      s"scan reads columns the aggregate never touches:\n$fmt")
  }

  test("q_revenue_join is a real join with partial aggregation, no cartesian") {
    val plan = q("q_revenue_join").queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian"))
    assert("HashAggregate".r.findAllIn(plan).size >= 2, s"no partial agg:\n$plan")
  }

  test("q_asof_join plans a single window pass, not a range join") {
    val plan = q("q_asof_join").queryExecution.executedPlan.toString
    assert(plan.contains("Window") && !plan.contains("Cartesian"),
      s"as-of must be a running window:\n$plan")
  }

  test("q_seq_pack avoids the single-reducer global window") {
    val plan = q("q_seq_pack").queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"prefix scan must not funnel through one window task:\n$plan")
  }

  test("q_percentiles avoids the buffer-everything percentile aggregate") {
    val plan = q("q_percentiles").queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("percentile"),
      s"must use distributed rank selection, not the buffering aggregate:\n$plan")
  }

  test("q_sample_mixture is a map-only scan + filter (no shuffle, no join)") {
    val plan = q("q_sample_mixture").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"systematic sampling must stay map-only:\n$plan")
  }

  test("q_ann_ivf corpus assignment stays map-only inside the probe join plan") {
    val plan = q("q_ann_ivf").queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian"), s"IVF has a cross join:\n$plan")
    // one broadcast join (probes→cells); the corpus side carries its cell
    // id from a projection, so no min_by aggregation appears anywhere
    assert(!plan.contains("min_by"), s"assignment regressed to join+agg:\n$plan")
  }

  test("q_doc_chunk is a map-only explode (no shuffle, no window, no join)") {
    val plan = q("q_doc_chunk").queryExecution.executedPlan.toString
    // the one allowed exchange is the small-fixture parallelize()
    // round-robin; anything keyed means chunking stopped being map-side
    assert(!plan.contains("hashpartitioning") && !plan.contains("rangepartitioning"),
      s"chunking must not shuffle on a key:\n$plan")
    assert(!plan.contains("Window") && !plan.contains("Join"),
      s"chunking must be a pure explode:\n$plan")
  }

  test("q_winnow shuffles once on doc_id; the groupBy reuses the window's partitioning") {
    val plan = q("q_winnow").queryExecution.executedPlan.toString
    val keyed = "hashpartitioning\\(doc_id".r.findAllIn(plan).length
    assert(keyed == 1,
      s"expected exactly one doc_id exchange (window), groupBy must reuse it:\n$plan")
    assert(plan.contains("Window"), s"winnowing needs its per-doc window:\n$plan")
  }

  test("ops 333-348 (causal/web/risk + eval/bandit batches): no cartesian, no keyed global sort") {
    // the round-8 widening tail — every plan must be shuffle-sane:
    // no CartesianProduct anywhere, and any Window without a
    // PARTITION BY must sit above an aggregated (bounded) frame,
    // which these plans express as a HashAggregate below the window
    val tail = Seq("q_quantile_normalize", "q_audience_overlap", "q_elasticity",
      "q_heaps_law", "q_stratified_ate", "q_html_strip", "q_power_mde",
      "q_gumbel_fit", "q_silhouette", "q_cross_corr", "q_ucb_arms",
      "q_shapley_attribution", "q_url_parse", "q_keyphrase_rake",
      "q_bloom_fpr", "q_feature_matrix")
    tail.foreach { k =>
      val plan = q(k).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$k has a cartesian:\n$plan")
      if (plan.contains("Window")) assert(plan.contains("HashAggregate"),
        s"$k windows over a non-aggregated (unbounded) frame:\n$plan")
    }
  }

  test("q_feature_matrix: one partial-aggregated pass, no window, no join on the event scan") {
    val plan = q("q_feature_matrix").queryExecution.executedPlan.toString
    assert("HashAggregate".r.findAllIn(plan).size >= 2, s"no partial agg:\n$plan")
    assert(!plan.contains("Window"), s"feature fold must be one aggregate:\n$plan")
  }

  test("q_html_strip stays inside whole-stage codegen (map-only strip + aggregate)") {
    val df = q("q_html_strip")
    // materialize first: under AQE the pre-execution plan string hides
    // the WholeStageCodegen stage markers
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"strip fell out of codegen:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q_quantile_sketch state aggregation is partial (map-side combinable)") {
    val plan = q("q_quantile_sketch").queryExecution.executedPlan.toString
    assert(plan.contains("partial_count") || plan.contains("partial"),
      s"sketch state build must combine map-side:\n$plan")
    assert(!plan.toLowerCase.contains("percentile"),
      s"sketch must not fall back to the buffering percentile aggregate:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoop"),
      s"the 5-row sketch estimate must broadcast into the exact join:\n$plan")
  }
}
