package graft

/** q_newsvendor, q_rosenbaum: driver-side replays of the round-10
  * inventory-optimization / matching-sensitivity surface. */
class InventorySensitivityOpsSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"
  private def q(key: String) = SparkEntry.queries(key)(spark, dir)

  test("newsvendor fractile stock replays and beats the mean stock") {
    val daily = eventsTable(dir)
      .filter("event_type = 'purchase'")
      .selectExpr("CAST(ts AS DATE) AS d").collect().map(_.getDate(0))
      .groupBy(identity).map(_._2.length.toLong).toSeq.sorted
    val n = daily.length.toLong
    val k = math.min((3 * n + 3) / 4, n)
    val qstar = daily((k - 1).toInt)
    val mean = daily.sum / n
    def cost(q: Long): Long =
      daily.map(x => 1 * math.max(q - x, 0) + 3 * math.max(x - q, 0)).sum *
        1000L / n
    val r = q("q_newsvendor").collect().head
    assert(r.getLong(0) == n)
    assert(r.getLong(1) == qstar && r.getLong(2) == cost(qstar))
    assert(r.getLong(3) == mean && r.getLong(4) == cost(mean))
    // the critical fractile is optimal among the two candidates
    assert(r.getLong(2) <= r.getLong(4),
      "fractile stock costs more than mean stock — formula inverted")
  }

  test("Rosenbaum z2 replays; sensitivity decays as gamma grows") {
    val cal = 10000L
    val rows = spark.sql(s"""
      SELECT o.o_orderkey,
             CAST(CAST(c.c_acctbal AS DECIMAL(18,2)) * 100 AS LONG),
             substr(o.o_orderpriority, 1, 1) = '1',
             CAST(o.o_orderstatus = 'F' AS LONG)
      FROM parquet.`$dir/orders.parquet` o
      JOIN parquet.`$dir/customer.parquet` c ON o.o_custkey = c.c_custkey""")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
        r.getLong(3)))
    val controls = rows.filter(!_._3)
    val reps = controls.groupBy(_._2)
      .map { case (b, xs) => (b, xs.minBy(_._1)._4) }
    val cbals = controls.map(_._2).distinct.sorted
    var t = 0L; var d = 0L
    for (tr <- rows.filter(_._3)) {
      val below = cbals.filter(_ <= tr._2).lastOption
        .filter(b => tr._2 - b <= cal)
      below.foreach { b =>
        val cy = reps(b)
        if (tr._4 != cy) { d += 1; if (tr._4 == 1) t += 1 }
      }
    }
    val want = Seq(1L, 2L, 3L).map { g =>
      val dev = BigInt((g + 1) * t - g * d)
      (g, d, t, if (d == 0) 0L else (dev * dev * 1000 / (BigInt(g) * d)).toLong)
    }.toSet
    val got = q("q_rosenbaum").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want)
    assert(d > 0, "no discordant pairs — vacuous")
  }
}
