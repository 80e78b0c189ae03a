package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.NativeText
import graft.plans.SizePruneJaccard

/** The size-filter optimizer rule: rewrites `jaccard_sets(a,b) >= t`
  * filters to short-circuit on the O(1) size bounds, provably without
  * changing results; plus the SparkSessionExtensions registration path
  * used by Verify/Bench sessions. */
class SizePruneJaccardSpec extends GraftSuite {
  import spark.implicits._

  private def withRule[T](f: => T): T = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ SizePruneJaccard
    try f finally spark.experimental.extraOptimizations = prev
  }

  // RDD-backed (LogicalRDD): a literal LocalRelation would be constant-
  // folded away before the rule's effect is observable in the plan
  private def pairsDf = spark.createDataFrame(
    spark.sparkContext.parallelize(Seq(
      (Seq(1L, 2L, 3L, 4L), Seq(1L, 2L, 3L, 4L)),      // j = 1.0
      (Seq(1L, 2L, 3L, 4L), Seq(1L, 2L, 3L, 5L)),      // j = 0.6
      (Seq(1L, 2L), Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L)),  // size-mismatched
      (Seq.empty[Long], Seq.empty[Long])               // both empty: j = 1.0
    ), 2)).toDF("a", "b")

  test("rewrite injects the size guard ahead of the intersection") {
    withRule {
      val df = pairsDf.filter(NativeText.jaccard_sets(col("a"), col("b")) >= 0.8)
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("cast(size("), s"no size guard injected:\n$optimized")
      assert("jaccardsets".r.findAllIn(optimized).size == 1,
        s"the exact comparison must survive once:\n$optimized")
    }
  }

  test("results are unchanged by the rule (guard is implied by the comparison)") {
    val query = () => pairsDf
      .filter(NativeText.jaccard_sets(col("a"), col("b")) >= 0.8)
      .select(size(col("a")).as("sa"), size(col("b")).as("sb"))
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    val without = query()
    val withR = withRule(query())
    assert(withR == without)
    assert(without == Set((4, 4), (0, 0)), "j>=0.8 keeps the dup and the empty pair")
  }

  test("the full minhash near-dup query returns identical rows under the rule") {
    val dir = "/root/testdata/sf0.001"
    val run = () => SparkEntry.queries("q_dedup_minhash")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val base = run()
    val ruled = withRule(run())
    assert(ruled == base, "size pruning must not change the near-dup pair set")
    assert(base.nonEmpty)
  }

  test("non-matching filters are left alone") {
    withRule {
      val df = pairsDf.filter(size(col("a")) >= 2)
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("jaccard_sets"))
    }
  }

  test("GraftExtensions registers the rule at session construction") {
    // build a sibling session over the SAME SparkContext with the
    // extensions config active (the Verify/Bench production path)
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      // withExtensions: the explicit injection API. (The string config
      // `spark.sql.extensions=graft.functions.GraftExtensions` used by
      // Verify/Bench only applies when the session creates its own
      // SparkContext — this JVM already has one.)
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new graft.functions.GraftExtensions())
        .getOrCreate()
      val df = s2.createDataFrame(
          s2.sparkContext.parallelize(Seq(Tuple2(Seq(1L, 2L), Seq(3L, 4L))), 1))
        .toDF("a", "b")
        .filter(NativeText.jaccard_sets(col("a"), col("b")) >= 0.5)
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("cast(size("),
        s"extensions-registered rule did not fire:\n$optimized")
      assert(df.count() == 0)
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
