package graft

import org.apache.spark.sql.functions._

/** q_scd2_lookup, q_rate_shrinkage, q_bitmap_index on the sf0.001
  * fixtures: version routing, shrinkage direction, popcount audits.
  */
class WarehouseOpsSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"
  private def q(key: String) = SparkEntry.queries(key)(spark, dir)

  test("scd2 lookup routes every order to exactly one version, both versions used") {
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val cust = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey"), col("c_acctbal")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val out = q("q_scd2_lookup").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.length == orders.count(), "every order resolves exactly one version")
    // changed keys: orders after the cut see +500, before see the original
    val changed = out.filter(_._2 % 10 == 0)
    assert(changed.exists { case (_, ck, bal) => bal == cust(ck) + 500.0 },
      "post-cut lookups must hit version 2")
    assert(changed.exists { case (_, ck, bal) => bal == cust(ck) },
      "pre-cut lookups must hit version 1")
    // unchanged keys always see the original balance
    assert(out.filter(_._2 % 10 != 0).forall { case (_, ck, bal) => bal == cust(ck) })
  }

  test("scd2 lookup plans an equi-join on the key (range is residual only)") {
    val plan = q("q_scd2_lookup").queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"validity range must ride an equi-join as a residual:\n$plan")
  }

  test("shrinkage pulls every rate toward the prior mean, order-preserving") {
    val rows = q("q_rate_shrinkage").collect()
      .map(r => (r.getString(0), r.getDouble(3), r.getDouble(4)))
    val mu = rows.map(_._2).sum / rows.length
    rows.foreach { case (src, rate, shrunk) =>
      if (rate > mu) assert(shrunk <= rate + 1e-9, s"$src: above-mean rate must shrink down")
      if (rate < mu) assert(shrunk >= rate - 1e-9, s"$src: below-mean rate must shrink up")
    }
    // shrinkage is monotone: ranking by shrunk never inverts equal-n raw ranking
    val sorted = rows.sortBy(_._2)
    sorted.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 <= b._3 + 1e-9, s"equal-n shrinkage must preserve order: $a vs $b")
    }
  }

  test("bitmap popcounts agree with direct counts and the AND is non-empty") {
    val rows = q("q_bitmap_index").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.length == 3)
    rows.foreach { case (tag, bc, dc, ok) =>
      assert(ok && bc == dc, s"$tag: bitmap $bc != direct $dc")
    }
    val and = rows.find(_._1.contains("AND")).get
    assert(and._2 > 0, "the conjunction must match real rows (non-vacuous)")
  }
}
