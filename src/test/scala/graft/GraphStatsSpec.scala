package graft

import org.apache.spark.sql.functions._

/** q_assortativity, q_bootstrap_ci, q_runs_test: exact driver replays
  * on sf0.001 plus sanity contracts (CI brackets the mean, runs stats
  * internally consistent). */
class GraphStatsSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"
  private def q(key: String) = SparkEntry.queries(key)(spark, dir)

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("assortativity matches an exact driver recomputation") {
    val baskets = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = baskets.groupBy(_._1).values.flatMap { items =>
      val pks = items.map(_._2).sorted
      for (i <- pks.indices; j <- (i + 1) until pks.length) yield (pks(i), pks(j))
    }.groupBy(identity).filter(_._2.size >= 2).keySet
    val deg = edges.toSeq.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val xs = edges.toSeq.flatMap { case (a, b) =>
      Seq((deg(a), deg(b)), (deg(b), deg(a)))
    }
    val m = BigInt(xs.length)
    val sx = xs.map(p => BigInt(p._1)).sum
    val sxy = xs.map(p => BigInt(p._1) * p._2).sum
    val sxx = xs.map(p => BigInt(p._1) * p._1).sum
    val expected = round6((m * sxy - sx * sx).toDouble / (m * sxx - sx * sx).toDouble)
    val row = q("q_assortativity").collect().head
    assert(row.getLong(0) == edges.size.toLong)
    assert(row.getDouble(1) == expected)
  }

  test("bootstrap CI matches the fixed-point replay and brackets the mean") {
    val cents = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_type"), col("user_id"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("c"))
      .groupBy("event_type", "user_id").agg(sum("c").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = cents.groupBy(_._1).map { case (ty, xs) =>
      val ms = (0 until 32).flatMap { b =>
        val mem = xs.filter { case (_, u, _) =>
          ((u % 1000003) * 2654435761L + b * 40503L) % 2147483647L % 2 == 0
        }
        if (mem.isEmpty) None
        else {
          val (nb, sb) = (BigInt(mem.length), mem.map(x => BigInt(x._3)).sum)
          Some((2 * sb * 1000000 + nb) / (2 * nb))
        }
      }
      val b = BigInt(ms.length)
      val sm = ms.sum
      val smm = ms.map(m => m * m).sum
      val mean = sm.toDouble / b.toDouble
      val sd = math.sqrt((b * smm - sm * sm).toDouble / (b * (b - 1)).toDouble)
      (ty, ms.length.toLong, round6(mean / 1e8),
        round6((mean - 2.0 * sd) / 1e8), round6((mean + 2.0 * sd) / 1e8))
    }.toSet
    val got = q("q_bootstrap_ci").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4))).toSet
    assert(got == expected && got.nonEmpty)
    got.foreach { case (ty, _, m, lo, hi) =>
      assert(lo <= m && m <= hi, s"$ty: CI [$lo,$hi] misses mean $m")
    }
  }

  test("runs test matches a sequential driver replay") {
    val months = spark.read.parquet(s"$dir/orders.parquet")
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("m"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    val ups = months.sliding(2).collect {
      case Seq((_, p), (_, c)) if c != p => c > p
    }.toSeq
    val n1 = ups.count(identity).toLong
    val n2 = ups.size - n1
    val runs = (1L +: ups.sliding(2).collect {
      case Seq(a, b) if a != b => 1L
    }.toSeq).sum
    val row = q("q_runs_test").collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) == ((n1, n2, runs)))
    val nn = (n1 + n2).toDouble
    val e = 2.0 * (n1 * n2).toDouble / nn + 1.0
    assert(row.getDouble(3) == round6(runs - e))
  }
}
