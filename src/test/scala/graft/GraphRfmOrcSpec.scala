package graft

import org.apache.spark.sql.functions._

/** q_triangle, q_rfm, q_orc_roundtrip: hand recomputation on sf0.001
  * plus the plan contracts (no quadratic stage, no single-reducer
  * window, filter pushed to the ORC scan). */
class GraphRfmOrcSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"
  private def q(key: String) = SparkEntry.queries(key)(spark, dir)

  test("triangle census matches a brute-force driver recomputation") {
    val baskets = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = baskets.groupBy(_._1).values.flatMap { items =>
      val pks = items.map(_._2).sorted
      for (i <- pks.indices; j <- (i + 1) until pks.length) yield (pks(i), pks(j))
    // NB: Map.collect returning a tuple rebuilds a MAP (dedup on _1) —
    // filter + keySet keeps the full edge set
    }.groupBy(identity).filter(_._2.size >= 2).keySet
    val adj = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nodes = adj.keySet
    val wedges = nodes.toSeq.map { v =>
      val d = adj(v).size.toLong; d * (d - 1) / 2
    }.sum
    val triangles = edges.toSeq.map { case (a, b) =>
      (adj(a) & adj(b)).count(c => c > b).toLong
    }.sum
    val row = q("q_triangle").collect().head
    assert(row.getLong(0) == nodes.size.toLong)
    assert(row.getLong(1) == edges.size.toLong)
    assert(row.getLong(2) == wedges)
    assert(row.getLong(3) == triangles)
    assert(row.getLong(4) == 3L * triangles * 1000000 / wedges)
  }

  test("triangle plan joins on keys — no cartesian or nested-loop stage") {
    val plan = q("q_triangle").queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian stage:\n$plan")
  }

  test("RFM segments match an exact rank-banded driver replay") {
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_custkey"), col("o_orderdate").cast("string"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val gmax = orders.map(_._2).max
    def days(a: String, b: String): Long =
      java.time.temporal.ChronoUnit.DAYS.between(
        java.time.LocalDate.parse(a.take(10)), java.time.LocalDate.parse(b.take(10)))
    val cust = orders.groupBy(_._1).map { case (k, xs) =>
      (k, days(xs.map(_._2).max, gmax), xs.length.toLong, xs.map(_._3).sum)
    }.toSeq
    val n = cust.length.toLong
    def ranks(key: ((Long, Long, Long, Long)) => (Long, Long)): Map[Long, Long] =
      cust.sortBy(key).zipWithIndex
        .map { case (c, i) => c._1 -> (i + 1).toLong }.toMap
    val rRank = ranks(c => (-c._2, c._1))
    val fRank = ranks(c => (c._3, c._1))
    val mRank = ranks(c => (c._4, c._1))
    def band(r: Long): Int = (1 + (r - 1) * 5 / n).toInt
    val expected = cust.map { case (k, rec, _, cents) =>
      val (r, f, m) = (band(rRank(k)), band(fRank(k)), band(mRank(k)))
      val seg =
        if (r >= 4 && f >= 4 && m >= 4) "champion"
        else if (r <= 2 && f >= 4) "at_risk_loyal"
        else if (m == 5) "big_spender"
        else if (r >= 4) "recent"
        else if (r <= 2) "dormant"
        else "mid"
      (seg, rec, cents)
    }.groupBy(_._1).map { case (seg, xs) =>
      (seg, xs.length.toLong, xs.map(_._3).sum, xs.map(_._2).sum)
    }.toSet
    val got = q("q_rfm").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected && got.nonEmpty)
  }

  test("RFM ranks come from the distributed scan — no Window operator") {
    val plan = q("q_rfm").queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"single-reducer rank window:\n$plan")
  }

  test("ORC round-trip equals a recompute from the source table") {
    val expected = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_totalprice") > 150000.0)
      .groupBy(col("o_orderstatus"), year(col("o_orderdate")).as("yr"))
      .agg(count(lit(1)).as("n"),
        sum((col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
          .as("sum_cents"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet
    val got = q("q_orc_roundtrip").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected && got.nonEmpty)
  }

  test("ORC scan pushes the totalprice filter") {
    val plan = q("q_orc_roundtrip").queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("o_totalprice"),
      s"no pushed filter on the ORC scan:\n$plan")
  }
}
