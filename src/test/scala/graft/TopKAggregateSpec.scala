package graft

import org.apache.spark.sql.functions._
import graft.functions.TopKAggregate.topk_by
import graft.operators.Similarity

class TopKAggregateSpec extends GraftSuite {
  import spark.implicits._

  test("topk_by keeps the k best per group, ordered score desc / id asc") {
    val df = Seq(
      ("a", 1L, 0.9), ("a", 2L, 0.7), ("a", 3L, 0.95), ("a", 4L, 0.7),
      ("b", 5L, 0.1),
    ).toDF("g", "id", "score")
    val out = df.groupBy("g").agg(topk_by(col("score"), col("id"), 2).as("top"))
      .orderBy("g")
      .select(col("g"), expr("transform(top, t -> t.id)").as("ids"))
      .as[(String, Seq[Long])].collect()
    assert(out.toSeq == Seq(
      ("a", Seq(3L, 1L)),  // 0.95 then 0.9
      ("b", Seq(5L)),      // fewer than k rows → all of them
    ))
  }

  test("equal scores tie-break by smaller id, matching window semantics") {
    val df = Seq(("a", 9L, 0.5), ("a", 2L, 0.5), ("a", 7L, 0.5)).toDF("g", "id", "score")
    val out = df.groupBy("g").agg(topk_by(col("score"), col("id"), 2).as("top"))
      .select(expr("transform(top, t -> t.id)")).as[Seq[Long]].head()
    assert(out == Seq(2L, 7L))
  }

  test("agrees with the brute-force window top-k on real embeddings") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = e.filter(col("vec_id") < 4).select(col("vec_id").as("q_id"), col("embedding"))
    val windowed = Similarity.bruteForceTopK(queries, e, k = 5)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet

    val q = broadcast(queries.select(col("q_id"), col("embedding").as("__qv")))
    val viaAgg = e.select(col("vec_id"), col("embedding").as("__cv"))
      .join(q)
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id"),
        Similarity.cosine(col("__qv"), col("__cv")).as("cosine"))
      .groupBy("q_id").agg(topk_by(col("cosine"), col("vec_id"), 5).as("top"))
      .select(col("q_id"), explode(expr("transform(top, t -> t.id)")).as("vec_id"))
      .as[(Long, Long)].collect().toSet
    assert(viaAgg == windowed)
  }

  test("bottomk_distinct equals distinct + topk_by(-v) with ascending output") {
    // the q_hyperanf sketch-cap pair it replaces (two shuffles -> one)
    val rows = (1 to 5000).map(i => ((i % 7).toLong, (i * 13 % 97).toLong))
    val df = rows.toDF("v", "h").repartition(8)
    val viaBottomK = df.groupBy("v")
      .agg(graft.functions.TopKAggregate.bottomk_distinct(col("h"), 32).as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    val viaPair = df.distinct().groupBy("v")
      .agg(topk_by(-col("h").cast("double"), col("h"), 32).as("t"))
      .select(col("v"), expr("array_sort(transform(t, e -> e.id))").as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    assert(viaBottomK == viaPair)
    viaBottomK.values.foreach { hs =>
      assert(hs == hs.sorted && hs == hs.distinct && hs.size <= 32)
    }
  }

  test("plan shows partial + final aggregation (map-side bounded heaps)") {
    val df = Seq(("a", 1L, 0.9)).toDF("g", "id", "score")
    val plan = df.groupBy("g").agg(topk_by(col("score"), col("id"), 2))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_topk_by") || "Aggregate".r.findAllIn(plan).size >= 2,
      s"expected two-phase aggregation:\n$plan")
  }
}
