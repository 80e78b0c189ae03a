package graft

import org.apache.spark.sql.SparkSession

/** The ONE place the production session config lives.
  *
  * Every graft entry point (Bench, Verify, ExplainDump) builds its
  * session through `builder(...)` so the scale-critical settings cannot
  * drift apart between them — the r13 sf100 sweep found exactly that
  * class of bug the hard way: Spark's 128-key ObjectHashAggregate
  * sort-based fallback silently sorted an 8e9-row typed-aggregate input
  * to disk because only some builders carried the raised threshold.
  * SessionContractSpec asserts both that the configs below land on a
  * session built here and that the three mains reference this builder,
  * so a refactor that drops either fails `sbt test`, not the next
  * hundred-terabyte run.
  */
object GraftSession {

  /** Settings every graft session must carry (asserted by
    * SessionContractSpec — add here, never inline in a main):
    *
    *   - graft extensions (native expressions used by the registry);
    *   - UTC (oracle parity: DuckDB sessions are UTC);
    *   - ObjectHashAggregate fallback raised 128 → 4M keys: graft's
    *     typed-imperative aggregates (TopKAggregate & co) hold BOUNDED
    *     per-key state, so hash aggregation stays cheap at millions of
    *     keys, while the default fallback turns into a full sort of the
    *     pre-aggregation stream (the sf100 q_knn_graph spill killer);
    *   - no UI (headless runs).
    */
  val requiredConfigs: Map[String, String] = Map(
    "spark.sql.extensions" -> "graft.functions.GraftExtensions",
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.objectHashAggregate.sortBased.fallbackThreshold" -> "4194304",
    "spark.ui.enabled" -> "false")

  /** Shuffle parallelism: `SPARK_GRAFT_SHUFFLE_PARTITIONS` overrides the
    * caller's default (normally = cores). 32-way shuffles are the right
    * grain at bench SFs but ~0.5 GB tasks at sf100 — large-SF sweeps
    * pass a higher count, the same lever a real cluster pulls. */
  def shufflePartitions(default: String): String =
    sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", default)

  /** Builder with the shared config applied; callers add their own
    * entry-point-specific settings (AQE, codec, master overrides) on
    * top before `getOrCreate()`. */
  def builder(cores: String, defaultPartitions: String): SparkSession.Builder = {
    val base = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", shufflePartitions(defaultPartitions))
    requiredConfigs.foldLeft(base) { case (b, (k, v)) => b.config(k, v) }
  }
}
