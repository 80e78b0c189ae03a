package graft

import org.apache.spark.sql.functions._

/** Ops 317-320 (round-8 widening, curation + market structure):
  * boilerplate phrases, HHI, cycle time, length EMD — driver replays
  * at sf0.001 with plain Scala collections. */
class CurationEconOpsSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"

  test("q_boilerplate_phrases: df counts replay; phrases are real text") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val nd = docs.length.toLong
    val df = docs.flatMap { case (id, text) =>
      val ws = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      ws.sliding(5).filter(_.size == 5).map(_.mkString(" ")).distinct
        .map(p => (p, id))
    }.groupBy(_._1).view.mapValues(_.map(_._2).distinct.size.toLong)
      .filter(_._2 >= 3).toMap
    val want = df.toSeq.sortBy(t => (-t._2, t._1)).take(20)
      .map { case (p, d) => (p, d, d * 1000000L / nd) }
    val got = SparkEntry.queries("q_boilerplate_phrases")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
    assert(got.forall(_._1.split(" ").length == 5), "5-word phrases")
  }

  test("q_hhi: concentration folds replay; bounded by top-share²..1e8") {
    val got = SparkEntry.queries("q_hhi")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == 25)
    got.foreach { case (nk, ns, hhi, top) =>
      // 1/n floor (equal shares) and 1e8 ceiling (monopoly)
      assert(hhi >= 100000000L / ns - 1 && hhi <= 100000000L, s"nation $nk")
      // HHI >= (top share)² up to ppm-truncation slack
      val topSq = top * top / 10000L
      assert(hhi >= topSq - 200, s"nation $nk hhi $hhi < top² $topSq")
      assert(top <= 1000000L)
    }
  }

  test("q_cycle_time: exact mean and rank percentiles replay") {
    val lags = {
      val orders = spark.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey"), col("o_orderpriority"),
          to_date(col("o_orderdate")).as("od"))
      spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey"), to_date(col("l_shipdate")).as("sd"))
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority"), datediff(col("sd"), col("od")))
        .collect().map(r => (r.getString(0), r.getInt(1).toLong))
    }
    val want = lags.groupBy(_._1).map { case (p, ls) =>
      val xs = ls.map(_._2).sorted
      val n = xs.size
      def qcont(q: Double): Long = {
        val h = q * (n - 1)
        val lo = xs(h.toInt); val hi = xs(math.min(h.toInt + 1, n - 1))
        math.floor(lo + (h - h.toInt) * (hi - lo)).toLong
      }
      (p, n.toLong, xs.sum * 1000000L / n, qcont(0.5), qcont(0.95))
    }.toSet
    val got = SparkEntry.queries("q_cycle_time")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == want)
  }

  test("q_emd_lengths: exact CDF-gap integral replays per source") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("source"), length(col("text")).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val nc = docs.length.toLong
    val lensAll = docs.map(_._2).groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val domain = lensAll.keys.toSeq.sorted
    val want = docs.groupBy(_._1).map { case (src, ds) =>
      val ns = ds.size.toLong
      val bySrc = ds.map(_._2).groupBy(identity).view
        .mapValues(_.size.toLong).toMap
      var cums = 0L; var cumc = 0L
      var num = BigInt(0)
      domain.zipWithIndex.foreach { case (v, i) =>
        cums += bySrc.getOrElse(v, 0L); cumc += lensAll(v)
        val dv = if (i + 1 < domain.size) domain(i + 1) - v else 0L
        num += (BigInt(cums) * nc - BigInt(cumc) * ns).abs * dv
      }
      (src, ns, (num * 1000 / (BigInt(ns) * nc)).toLong)
    }.toSet
    val got = SparkEntry.queries("q_emd_lengths")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    assert(got.forall(_._3 >= 0))
  }
}
