package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

class SamplingSpec extends GraftSuite {
  import spark.implicits._

  private lazy val df = (1L to 10000L).toDF("id")
    .withColumn("s", when(col("id") % 2 === 0, "a").otherwise("b"))

  test("stratified rates are respected within tolerance") {
    val out = Sampling.stratifiedSample(df, "id", "s",
      Map("a" -> 0.5, "b" -> 0.1))
    val byStratum = out.groupBy("s").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val ra = byStratum.getOrElse("a", 0L).toDouble / 5000
    val rb = byStratum.getOrElse("b", 0L).toDouble / 5000
    assert(math.abs(ra - 0.5) < 0.05, s"stratum a rate $ra")
    assert(math.abs(rb - 0.1) < 0.05, s"stratum b rate $rb")
  }

  test("membership is deterministic and stable under repartitioning") {
    val keep1 = Sampling.stratifiedSample(df, "id", "s", Map("a" -> 0.3), 0.2)
      .select("id").as[Long].collect().toSet
    val keep2 = Sampling.stratifiedSample(df.repartition(7), "id", "s", Map("a" -> 0.3), 0.2)
      .select("id").as[Long].collect().toSet
    assert(keep1 == keep2)
    assert(keep1.nonEmpty)
  }

  test("every bucket is reachable — full 1/1000 rate resolution") {
    val n = (1L to 10000L).toDF("id")
      .select(Sampling.systematicBucket(col("id"), 1000).as("b"))
      .distinct().count()
    assert(n == 1000L, s"only $n of 1000 buckets reachable — multiplier not coprime?")
  }

  test("rate 0 drops a stratum entirely; rate 1 keeps it entirely") {
    val out = Sampling.stratifiedSample(df, "id", "s", Map("a" -> 1.0, "b" -> 0.0))
    assert(out.filter(col("s") === "b").count() == 0)
    assert(out.filter(col("s") === "a").count() == 5000)
  }
}
