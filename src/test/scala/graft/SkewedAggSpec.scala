package graft

import org.apache.spark.sql.functions._
import graft.operators.SkewedAgg

class SkewedAggSpec extends GraftSuite {
  import spark.implicits._

  test("saltedCountSum equals the plain groupBy on a skewed distribution") {
    // one hot key (90% of rows) + a long tail
    val df = (1 to 2000).map { i =>
      val k = if (i % 10 != 0) "hot" else s"cold_${i % 7}"
      (k, java.math.BigDecimal.valueOf(i.toLong, 2))
    }.toDF("k", "v")
    val salted = SkewedAgg.saltedCountSum(df, "k", "v", salts = 8)
      .orderBy("k").collect()
    val plain = df.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("total"))
      .orderBy("k").collect()
    assert(salted.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      plain.map(r => (r.getString(0), r.getLong(1))).toSeq)
    assert(salted.map(_.getDecimal(2).stripTrailingZeros).toSeq ==
      plain.map(_.getDecimal(2).stripTrailingZeros).toSeq)
  }

  test("saltedCountDistinct is exact (salt derived from the value)") {
    val df = Seq(("a", 1), ("a", 1), ("a", 2), ("b", 7), ("b", 8), ("b", 8), ("b", 9))
      .toDF("k", "v")
    val out = SkewedAgg.saltedCountDistinct(df, "k", "v", salts = 4)
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("a", 2L), ("b", 3L)))
  }

  test("phase-1 aggregation actually splits the hot key across salts") {
    val df = spark.range(1000).select(lit("hot").as("k"), col("id").as("v"))
      .repartition(4)
    val phase1Groups = df
      .withColumn("__salt", pmod(monotonically_increasing_id(), lit(8)))
      .groupBy("k", "__salt").count().count()
    assert(phase1Groups > 1L, "hot key must spread over multiple salt groups")
  }
}
