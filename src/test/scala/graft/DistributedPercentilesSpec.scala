package graft

import org.apache.spark.sql.functions._
import graft.operators.DistributedPercentiles

class DistributedPercentilesSpec extends GraftSuite {
  import spark.implicits._

  test("matches the built-in exact percentile aggregate on real data") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val dist = DistributedPercentiles.exact(orders, "o_orderpriority",
      "o_totalprice", Seq("p50" -> 0.5, "p95" -> 0.95))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    val builtin = orders.groupBy("o_orderpriority")
      .agg(expr("percentile(o_totalprice, 0.5)").as("p50"),
        expr("percentile(o_totalprice, 0.95)").as("p95"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    assert(dist.length == builtin.length)
    dist.zip(builtin).foreach { case ((g1, a50, a95), (g2, b50, b95)) =>
      assert(g1 == g2)
      assert(a50 == b50, s"$g1 p50: $a50 != $b50")
      assert(a95 == b95, s"$g1 p95: $a95 != $b95")
    }
  }

  test("interpolation and edge groups: singletons, pairs, and nulls") {
    val df = Seq(
      ("a", Some(10.0)),              // singleton: every percentile = 10
      ("b", Some(1.0)), ("b", Some(3.0)), // pair: p50 = 2 (midpoint)
      ("c", Some(5.0)), ("c", None)   // null ignored → singleton
    ).toDF("g", "v")
    val out = DistributedPercentiles.exact(df, "g", "v",
      Seq("p0" -> 0.0, "p50" -> 0.5, "p100" -> 1.0))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(out.toSeq == Seq(
      ("a", 10.0, 10.0, 10.0),
      ("b", 1.0, 2.0, 3.0),
      ("c", 5.0, 5.0, 5.0)))
  }

  test("empty input yields an empty typed frame") {
    val df = Seq.empty[(String, Double)].toDF("g", "v")
    val out = DistributedPercentiles.exact(df, "g", "v", Seq("p50" -> 0.5))
    assert(out.collect().isEmpty)
    assert(out.schema.fieldNames.toSeq == Seq("g", "p50"))
  }
}
