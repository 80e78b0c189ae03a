package graft

import org.apache.spark.sql.functions._

/** q_cuped, q_winsorize, q_erasure_audit: exact driver recomputation on
  * sf0.001 plus the shape contracts (variance actually reduced, clamp
  * band ordering, cascade consistency). */
class CupedWinsorErasureSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"
  private def q(key: String) = SparkEntry.queries(key)(spark, dir)

  private def userCents(): Array[(Long, Long, Long)] = {
    eventsTable(dir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
  }

  test("CUPED theta and adjusted means match an exact driver replay") {
    val rows = userCents()
    val mid = (rows.map(_._2).min + rows.map(_._2).max) / 2
    val users = rows.groupBy(_._1).map { case (u, xs) =>
      (u, xs.filter(_._2 < mid).map(_._3).sum, xs.filter(_._2 >= mid).map(_._3).sum)
    }.toSeq
    val n = BigInt(users.length)
    val sx = users.map(u => BigInt(u._2)).sum
    val sy = users.map(u => BigInt(u._3)).sum
    val sxy = users.map(u => BigInt(u._2) * u._3).sum
    val sxx = users.map(u => BigInt(u._2) * u._2).sum
    val theta = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
    def round6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = users.groupBy(_._1 % 2).map { case (arm, xs) =>
      val na = xs.length.toLong
      val (sxa, sya) = (xs.map(u => BigInt(u._2)).sum, xs.map(u => BigInt(u._3)).sum)
      val meanPost = sya.toDouble / na / 100.0
      val adj = (sya.toDouble / na -
        theta * (sxa.toDouble / na - sx.toDouble / n.toDouble)) / 100.0
      (arm.toInt, na, round6(meanPost), round6(adj), round6(theta))
    }.toSet
    val got = q("q_cuped").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4))).toSet
    assert(got == expected && got.size == 2)
  }

  test("CUPED adjustment reduces the within-arm spread at sf0.01") {
    // variance reduction is the operator's whole point — check the
    // adjusted means sit closer to each other than the raw means when
    // arms are a random split (no true effect in synthetic data)
    val r = SparkEntry.queries("q_cuped")(spark, "/root/testdata/sf0.01")
      .collect().map(x => (x.getDouble(2), x.getDouble(3)))
    val rawGap = math.abs(r(0)._1 - r(1)._1)
    val adjGap = math.abs(r(0)._2 - r(1)._2)
    assert(adjGap <= rawGap * 1.5,
      s"CUPED widened the arm gap implausibly: raw=$rawGap adj=$adjGap")
  }

  test("winsorize matches a driver replay and clamps both tails") {
    val rows = userCents()
    val byTypeUser = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_type"), col("user_id"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(t => (t._1, t._2)).map { case ((ty, u), xs) =>
        (ty, u, xs.map(_._3).sum)
      }.toSeq
    def quantile(sorted: Array[Long], p: Double): Double = {
      val pos = p * (sorted.length - 1)
      val lo = sorted(math.floor(pos).toInt)
      val hi = sorted(math.ceil(pos).toInt)
      (math.ceil(pos) - pos) * lo + (pos - math.floor(pos)) * hi
    }
    def round6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = byTypeUser.groupBy(_._1).map { case (ty, xs) =>
      val vs = xs.map(_._3).sorted.toArray
      val (lo, hi) = (quantile(vs, 0.125), quantile(vs, 0.875))
      val w = vs.map(v => if (v < lo) lo else if (v > hi) hi else v.toDouble)
      (ty, vs.length.toLong, vs.count(_ < lo).toLong, vs.count(_ > hi).toLong,
        round6(w.sum / 100.0))
    }.toSet
    val got = q("q_winsorize").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet
    assert(got == expected && got.nonEmpty)
    assert(got.exists(r => r._3 > 0 && r._4 > 0), "no tail ever clamped — vacuous")
  }

  test("erasure audit: purged+kept=total and the cascade is consistent") {
    val rows = q("q_erasure_audit").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(rows.keySet == Set("events", "orders", "lineitem"))
    rows.values.foreach { case (total, purged, kept, _) =>
      assert(purged + kept == total)
    }
    // direct recomputation of the orders purge
    val ids = spark.read.parquet(s"$dir/customer.parquet")
      .filter(col("c_custkey") % 13 === 0)
      .collect().map(_.getLong(0)).toSet
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_custkey", "o_orderkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val purgedOrders = orders.filter(o => ids.contains(o._1)).map(_._2).toSet
    assert(rows("orders")._2 == purgedOrders.size.toLong)
    assert(rows("orders")._4 ==
      orders.filterNot(o => ids.contains(o._1)).map(_._2).sum)
    assert(rows("orders")._2 > 0, "empty purge set — vacuous audit")
    // cascade: lineitem purge count matches the purged order keys
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey").collect().map(_.getLong(0))
    assert(rows("lineitem")._2 == li.count(purgedOrders.contains).toLong)
  }

  test("erasure audit broadcasts the deletion registry") {
    val plan = q("q_erasure_audit").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast anti/semi join:\n$plan")
  }
}
