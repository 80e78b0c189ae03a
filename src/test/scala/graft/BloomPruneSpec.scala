package graft

import org.apache.spark.sql.functions._
import graft.operators.BloomPrune

class BloomPruneSpec extends GraftSuite {
  import spark.implicits._

  test("bloom-pruned semi-join equals the plain semi-join (false positives removed)") {
    val big = (1L to 2000L).map(i => (i, i % 100)).toDF("row_id", "fk")
    val small = Seq(3L, 7L, 42L).toDF("pk")
    val pruned = BloomPrune.semiJoin(big, small, "fk", "pk", expectedItems = 100L)
      .select("row_id").collect().map(_.getLong(0)).sorted
    val exact = big.join(small, $"fk" === $"pk", "left_semi")
      .select("row_id").collect().map(_.getLong(0)).sorted
    assert(pruned.toSeq == exact.toSeq)
    assert(pruned.length == 60) // 3 of 100 fk values × 20 rows each
  }

  test("the bloom never false-negatives: every true match passes the pre-filter") {
    val keys = (1L to 500L).toDF("pk")
    val bytes = keys.select(BloomPrune.bloomAgg(col("pk"), 500L, 4096L).as("bf"))
      .head.getAs[Array[Byte]](0)
    val misses = keys.filter(!BloomPrune.mightContain(bytes, col("pk"))).count()
    assert(misses == 0L, "a Bloom filter must not drop true members")
  }

  test("the pre-filter actually prunes: most non-members are rejected before the join") {
    val members = (1L to 100L).toDF("pk")
    val bytes = members.select(BloomPrune.bloomAgg(col("pk"), 100L, 1024L).as("bf"))
      .head.getAs[Array[Byte]](0)
    val nonMembers = (10001L to 11000L).toDF("k")
    val passed = nonMembers.filter(BloomPrune.mightContain(bytes, col("k"))).count()
    assert(passed < 200L, s"pre-filter should reject most of 1000 non-members, passed $passed")
  }

  test("same key name on both sides works (no ambiguous reference)") {
    val big = (1L to 50L).map(i => (i, i % 10)).toDF("row_id", "k")
    val small = Seq(1L, 2L).toDF("k")
    val out = BloomPrune.semiJoin(big, small, "k", "k", expectedItems = 10L)
    assert(out.count() == 10L)
    assert(out.columns.toSeq == Seq("row_id", "k"))
  }

  test("mismatched key types fail loudly (xxhash64 is type-sensitive)") {
    val big = Seq((1L, 1)).toDF("row_id", "fk") // fk: int
    val small = Seq(1L).toDF("pk")              // pk: long
    val e = intercept[IllegalArgumentException] {
      BloomPrune.semiJoin(big, small, "fk", "pk", expectedItems = 10L)
    }
    assert(e.getMessage.contains("key types"))
  }

  test("the might_contain filter sits on the big side before the join in the plan") {
    // parquet-backed big side: a local Seq would let ConvertToLocalRelation
    // evaluate the bloom filter at optimization time and hide it from the plan
    val dir = "target/bloom_spec_big"
    (1L to 100L).map(i => (i, i % 10)).toDF("row_id", "fk")
      .write.mode("overwrite").parquet(dir)
    val big = spark.read.parquet(dir)
    val small = Seq(1L, 2L).toDF("pk")
    val plan = BloomPrune.semiJoin(big, small, "fk", "pk", expectedItems = 10L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"bloom probe missing from the plan:\n$plan")
  }
}
