package graft

import org.apache.spark.sql.functions._

/** q_pagerank, q_ewma, q_cohort_ltv on the sf0.001 fixtures. */
class PagerankEwmaSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"
  private def q(key: String) = SparkEntry.queries(key)(spark, dir)

  private def events = {
    eventsTable(dir)
  }

  test("pagerank: one row per transition-graph node, bounded exact mass") {
    val rows = q("q_pagerank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val types = events.select("event_type").distinct().count()
    assert(rows.length == types,
      "every event type appears in the sf0.001 transition graph")
    val v = rows.length.toLong
    val base = 15000000000L / (100L * v)
    rows.foreach { case (t, nanos, rank) =>
      assert(nanos >= base, s"$t rank below the teleport floor")
      assert(rank == nanos.toDouble / 1000000000.0, "rank is nanos/1e9 exactly")
    }
    // total mass ≤ 1e9 (floor truncation + dangling decay only shed mass)
    val mass = rows.map(_._2).sum
    assert(mass <= 1000000000L && mass > 500000000L,
      s"rank mass $mass outside (0.5e9, 1e9]")
    // deterministic: a second run reproduces the fixed-point ranks exactly
    val again = q("q_pagerank").collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    assert(again.toSeq == rows.map(r => (r._1, r._2)).sortBy(_._1).toSeq)
  }

  test("ewma matches a driver-side dyadic replay for every row of one user") {
    val uid = events.groupBy("user_id").count()
      .orderBy(desc("count"), col("user_id")).first().getLong(0)
    val raw = events.filter(col("user_id") === uid)
      .select(col("event_id"), col("ts"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("c"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
      .sortBy(r => (r._2.getTime, r._2.getNanos, r._1))
    assert(raw.length > 20, "need a user with enough events for full frames")
    val got = q("q_ewma").filter(col("user_id") === uid).collect()
      .map(r => (r.getLong(1), r.getLong(3), r.getDouble(4))).sortBy(_._1)
    assert(got.length == raw.length, "one smoothed row per event")
    raw.indices.foreach { i =>
      val frame = raw.slice(math.max(0, i - 15), i + 1).reverse // k=0 first
      val sv = frame.zipWithIndex.map { case ((_, _, c), k) => c * (1L << (15 - k)) }.sum
      val sw = frame.indices.map(k => 1L << (15 - k)).sum
      val want = BigDecimal(sv.toDouble / sw.toDouble / 100.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val (eid, nTerms, e) = got.find(_._1 == raw(i)._1).get
      assert(nTerms == frame.length, s"event $eid n_terms")
      assert(math.abs(e - want) < 1e-9, s"event $eid ewma $e != $want")
    }
  }

  test("cohort LTV triangle: partition of purchase revenue, running cums") {
    val rows = q("q_cohort_ltv").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    val totalCents = events.filter(col("event_type") === "purchase")
      .agg(sum((col("value").cast("decimal(18,2)") * 100).cast("long")))
      .first().getLong(0)
    assert(rows.map(_._6).sum == totalCents,
      "triangle cells partition total purchase revenue exactly")
    rows.groupBy(_._1).foreach { case (cw, cells) =>
      val inOrder = cells.sortBy(_._2)
      var cum = 0L
      inOrder.foreach { c =>
        assert(c._2 >= 0, s"$cw negative week offset")
        assert(c._4 <= c._3, s"$cw buyers exceed cohort size")
        assert(c._4 >= 1 && c._5 >= c._4, s"$cw purchase/buyer counts")
        cum += c._6
        assert(c._7 == cum, s"$cw week ${c._2} cumulative mismatch")
      }
    }
    assert(rows.nonEmpty)
  }
}
