package graft

import org.apache.spark.sql.functions._
import graft.operators.SaltedJoin

class SaltedJoinSpec extends GraftSuite {
  import spark.implicits._

  test("salted join equals the plain join on a skewed fact side") {
    // 90% of fact rows hit one hot key
    val fact = (1 to 2000).map { i =>
      (i.toLong, if (i % 10 != 0) 7L else (i % 5).toLong, i * 1.5)
    }.toDF("row_id", "fk", "amount")
    val dim = (0 to 9).map(k => (k.toLong, s"name_$k")).toDF("pk", "name")
    val salted = SaltedJoin.inner(fact, dim, "fk", "pk", salt = 8, saltFrom = col("row_id"))
      .select("row_id", "fk", "name")
      .orderBy("row_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val plain = fact.join(dim, $"fk" === $"pk")
      .select("row_id", "fk", "name")
      .orderBy("row_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(salted.toSeq == plain.toSeq)
    assert(salted.length == 2000)
  }

  test("the hot key's rows spread across multiple salt buckets") {
    val fact = spark.range(1000).select(col("id").as("row_id"), lit(7L).as("fk"))
    val buckets = fact
      .withColumn("__fsalt", pmod(xxhash64(col("row_id")), lit(8L)).cast("int"))
      .select("__fsalt").distinct().count()
    assert(buckets > 4L, s"expected the hot key over >4 of 8 salt buckets, got $buckets")
  }

  test("dim side replicates exactly salt ways; salt is part of the join key") {
    val fact = Seq((1L, 1L)).toDF("row_id", "fk")
    val dim = Seq((1L, "x"), (2L, "y")).toDF("pk", "name")
    val joined = SaltedJoin.inner(fact, dim, "fk", "pk", salt = 5, saltFrom = col("row_id"))
    // exactly one result row: the fact row meets only its own salt's replica
    assert(joined.count() == 1L)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("__dsalt") && plan.contains("__fsalt"),
      s"salt columns must be join keys:\n$plan")
  }

  test("no broadcast: the salted query path exercises a real shuffle join") {
    val orders = Seq((1L, 3L, 10.0)).toDF("o_orderkey", "o_custkey", "o_totalprice")
    val cust = Seq((3L, "SEG")).toDF("c_custkey", "c_mktsegment").hint("shuffle_hash")
    val plan = SaltedJoin.inner(orders, cust, "o_custkey", "c_custkey",
      salt = 8, saltFrom = col("o_orderkey")).queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"), s"expected a shuffled hash join:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"), s"salting must not collapse to broadcast:\n$plan")
  }
}
