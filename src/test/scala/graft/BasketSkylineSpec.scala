package graft

import org.apache.spark.sql.functions._

/** q_copurchase, q_skyline, q_outlier_iqr: hand recomputation on
  * sf0.001 plus the plan contracts (top-k cut, no quadratic stage,
  * broadcast fences). */
class BasketSkylineSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"
  private def q(key: String) = SparkEntry.queries(key)(spark, dir)

  test("copurchase lift/confidence match an exact driver recomputation") {
    val baskets = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nOrders = baskets.map(_._1).distinct.length.toLong
    val sup = baskets.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val pairCnt = baskets.groupBy(_._1).values.flatMap { items =>
      val pks = items.map(_._2).sorted
      for (i <- pks.indices; j <- (i + 1) until pks.length) yield (pks(i), pks(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = pairCnt.toSeq.collect { case ((a, b), c) if c >= 2 =>
      val lift = (BigInt(c) * nOrders * 1000000) / (BigInt(sup(a)) * sup(b))
      val conf = (BigInt(c) * 1000000) / sup(a)
      (a, b, c, lift.toLong, conf.toLong)
    }.sortBy { case (a, b, _, l, _) => (-l, a, b) }.take(20)
    val got = q("q_copurchase").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got == expected)
  }

  test("copurchase top-20 is TakeOrderedAndProject, not a global sort") {
    val plan = q("q_copurchase").queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"global sort for a top-20:\n$plan")
  }

  test("skyline equals the O(n²) dominance definition") {
    val pts = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "n_chars", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getString(2).trim.toLowerCase.split("\\s+").distinct.length.toLong))
    val expected = pts.filter { case (_, ca, ta) =>
      !pts.exists { case (_, cb, tb) =>
        cb >= ca && tb >= ta && (cb > ca || tb > ta)
      }
    }.map { case (id, c, t) => (id, c, t) }.toSet
    val got = q("q_skyline").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected && got.nonEmpty)
  }

  test("skyline plan has no quadratic stage") {
    val plan = q("q_skyline").queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"quadratic skyline plan:\n$plan")
  }

  test("IQR fences and outlier counts match an exact driver replay") {
    val cents = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_type"), col("user_id"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("c"))
      .groupBy("event_type", "user_id").agg(sum("c").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(2)))
    def quartile(sorted: Array[Long], p: Double): Double = {
      val pos = p * (sorted.length - 1)
      val lo = math.floor(pos).toLong.toInt
      val hi = math.ceil(pos).toLong.toInt
      if (lo == hi) sorted(lo).toDouble
      else (hi - pos) * sorted(lo) + (pos - lo) * sorted(hi)
    }
    val expected = cents.groupBy(_._1).map { case (t, xs) =>
      val vs = xs.map(_._2).sorted
      val (q1, q3) = (quartile(vs, 0.25), quartile(vs, 0.75))
      val (lo, hi) = (q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1))
      val nOut = vs.count(v => v < lo || v > hi).toLong
      (t, vs.length.toLong, nOut, round6(q1 / 100.0), round6(q3 / 100.0),
        round6(lo / 100.0), round6(hi / 100.0))
    }.toSet
    val got = q("q_outlier_iqr").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))).toSet
    assert(got == expected)
  }

  test("IQR fence fires on the larger fixture (non-vacuous at sf0.01)") {
    val got = SparkEntry.queries("q_outlier_iqr")(spark, "/root/testdata/sf0.01")
      .collect().map(_.getLong(2))
    assert(got.sum > 0, "fence never fires — vacuous check")
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
}
