package graft

import org.apache.spark.sql.functions._

/** q_gini, q_seasonality, q_benford on the sf0.001 fixtures. */
class GiniSeasonalitySpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"
  private def q(key: String) = SparkEntry.queries(key)(spark, dir)

  private def events = {
    eventsTable(dir)
  }

  test("gini matches a driver-side sorted replay and sits in [0,1)") {
    val row = q("q_gini").collect() match { case Array(r) => r }
    val (n, tot, g) = (row.getLong(0), row.getLong(1), row.getDouble(2))
    val perUser = events.filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(sum((col("value").cast("decimal(18,2)") * 100).cast("long")).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(n == perUser.length && tot == perUser.map(_._2).sum)
    val sorted = perUser.sortBy(p => (p._2, p._1)).map(_._2)
    val s = sorted.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
    val want = BigDecimal(
      (2.0 * s.toDouble - (n + 1).toDouble * tot.toDouble) / (n.toDouble * tot.toDouble))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(g - want) < 1e-9, s"gini $g != $want")
    assert(g >= 0.0 && g < 1.0)
  }

  test("seasonality indexes average to 1 over a type's observed hours") {
    val rows = q("q_seasonality").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty && rows.forall(r => r._2 >= 0 && r._2 <= 23))
    val total = events.count()
    assert(rows.map(_._3).sum == total, "cells partition the event count")
    rows.groupBy(_._1).foreach { case (t, cells) =>
      // Σ idx = Σ 24·cnt/tot = 24 exactly (modulo 6dp rounding) whatever
      // subset of hours is populated — the cnt/tot shares sum to 1
      assert(math.abs(cells.map(_._4).sum - 24.0) < 0.001,
        s"$t indexes sum to 24")
      assert(cells.map(_._2).distinct.length == cells.length, s"$t dup hours")
    }
  }

  test("benford digits partition orders; expected shares are the constants") {
    val rows = q("q_benford").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_totalprice") >= 1.0)
    assert(rows.map(_._2).sum == orders.count())
    val benford = Map(1L -> 0.301030, 2L -> 0.176091, 3L -> 0.124939,
      4L -> 0.096910, 5L -> 0.079181, 6L -> 0.066947, 7L -> 0.057992,
      8L -> 0.051153, 9L -> 0.045757)
    rows.foreach { case (d, n, obs, exp, excess) =>
      assert(d >= 1 && d <= 9, s"digit $d")
      assert(n > 0 && obs > 0.0)
      assert(exp == benford(d), s"digit $d expected share")
      assert(math.abs(excess - (obs - exp)) < 2e-6, s"digit $d excess")
    }
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4, "observed shares sum to 1")
  }
}
