package graft

import org.apache.spark.sql.functions._

/** q_fk_integrity, q_transition_matrix, q_zorder: hand-recomputed
  * expectations on the sf0.001 fixtures plus the locality measurement
  * that justifies the Z-order layout.
  */
class LayoutIntegritySpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"
  private def q(key: String) = SparkEntry.queries(key)(spark, dir)

  // --------------------------------------------------------- FK integrity

  test("fk audit finds exactly the late-dim orphans and nothing else") {
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val expectedOrphans = orders.filter(col("o_custkey") % 97 === 0).count()
    val rows = q("q_fk_integrity").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(rows("orders->customer")._2 == expectedOrphans,
      s"orphans ${rows("orders->customer")._2} != every-97th count $expectedOrphans")
    assert(expectedOrphans > 0, "late-dim scenario must produce orphans")
    assert(!rows("orders->customer")._3, "the late-dim edge must flag not-ok")
    assert(rows("lineitem->orders") == ((spark.read.parquet(s"$dir/lineitem.parquet").count(), 0L, true)),
      "the intact fact-to-fact edge must be clean")
    assert(rows("customer->nation")._2 == 0L && rows("customer->nation")._3)
  }

  // ---------------------------------------------------- transition matrix

  test("transition probabilities are per-from distributions (sum to 1)") {
    val out = q("q_transition_matrix").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (from, rs) =>
      val p = rs.map(_._4).sum
      assert(math.abs(p - 1.0) < 1e-4, s"P(·|$from) sums to $p")
    }
  }

  test("transition counts match a driver-side per-user sequence walk") {
    val ev = eventsTable(dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val expected = ev.groupBy(_._1).values.flatMap { g =>
      g.sortBy(e => (e._3, e._2)).sliding(2).collect {
        case Array(a, b) => (a._4, b._4)
      }
    }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = q("q_transition_matrix").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == expected, s"pair counts diverge: ${(got.toSet diff expected.toSet).take(3)}")
  }

  test("transition window partitions by user (no global window)") {
    val plan = q("q_transition_matrix").queryExecution.executedPlan.toString
    val winLines = plan.linesIterator.filter(_.contains("Window")).mkString("\n")
    assert(!winLines.contains("partitionBy=[]"),
      s"window must be user-bounded:\n$winLines")
  }

  // ---------------------------------------------------------------- zorder

  test("z-order buckets cluster BOTH dimensions (a linear sort cannot)") {
    val out = q("q_zorder").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    val n = out.map(_._1).sum
    assert(n == spark.read.parquet(s"$dir/orders.parquet").count(),
      "buckets must partition the table")
    def avgRange(f: ((Long, Long, Long, Long, Long)) => (Long, Long)): Double = {
      val rs = out.map(f); rs.map { case (lo, hi) => (hi - lo).toDouble }.sum / rs.length
    }
    val (ax, ay) = (avgRange(t => (t._2, t._3)), avgRange(t => (t._4, t._5)))
    // global range is 1023 in each dim; Morton buckets must narrow BOTH
    // (observed ~61): an eighth of global is a conservative ceiling
    assert(ax < 128 && ay < 128,
      s"per-bucket ranges must cluster both dims: x=$ax y=$ay (global 1023)")
  }
}
