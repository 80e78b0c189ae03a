package graft

import org.apache.spark.sql.functions._

/** q_session_entropy, q_rrf_fusion, q_local_clustering, q_peak_detect
  * on the sf0.001 fixtures. */
class FusionGraphPeaksSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"
  private def q(key: String) = SparkEntry.queries(key)(spark, dir)

  test("session entropy matches a driver replay and its bounds") {
    val ev = eventsTable(dir).select(col("user_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val expected = ev.groupBy(_._1).map { case (u, xs) =>
      val counts = xs.groupBy(_._2).values.map(_.length.toLong)
      val n = xs.length.toDouble
      // the fixed-point fold the query uses: Σ c·⌊ln(c)·1e6⌋ as longs
      val s = counts.map(c => c * math.floor(math.log(c.toDouble) * 1e6).toLong).sum
      val h = math.log(n) - s / (1e6 * n)
      u -> ((xs.length.toLong, counts.size.toLong,
        BigDecimal(h).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }
    val got = q("q_session_entropy").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty && got.length == expected.size)
    got.foreach { case (u, n, t, h) =>
      val (en, et, eh) = expected(u)
      assert(n == en && t == et, s"user $u counts")
      assert(math.abs(h - eh) <= 1e-6, s"user $u entropy $h != $eh")
      assert(h >= -1e-9 && h <= math.log(t.toDouble) + 1e-9,
        s"user $u entropy outside [0, ln n_types]")
    }
  }

  test("RRF fusion: ranks are permutations, fused score is the exact sum") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("n_chars"), lower(col("text")).as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getString(2).trim.split("\\s+").length.toLong))
    val ra = docs.sortBy(d => (-d._2, d._1)).zipWithIndex
      .map { case (d, i) => d._1 -> (i + 1L) }.toMap
    val rb = docs.sortBy(d => (-d._3, d._1)).zipWithIndex
      .map { case (d, i) => d._1 -> (i + 1L) }.toMap
    val fused = docs.map { d =>
      (d._1, ra(d._1), rb(d._1),
        1000000L / (60 + ra(d._1)) + 1000000L / (60 + rb(d._1)))
    }
    val expected = fused.sortBy(x => (-x._4, x._1)).take(100).toSeq
    val got = q("q_rrf_fusion").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
  }

  test("local clustering matches a brute-force per-node triangle count") {
    val edges = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).values.flatMap { g =>
        val ps = g.map(_._2).distinct.sorted
        for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
      // filter + keySet, NOT collect-to-pairs: collecting (a, b) tuples
      // out of a Map rebuilds a Map keyed by `a`, silently deduping
      // every edge that shares a left endpoint
      }.groupBy(identity).filter(_._2.size >= 2).keySet
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def nbrs(v: Long): Set[Long] =
      adj.getOrElse(v, Set.empty) ++ edges.collect { case (a, b) if b == v => a }
    // toSeq first: mapping the edge SET would dedup endpoints and
    // collapse every degree to 1
    val deg = (edges.toSeq.map(_._1) ++ edges.toSeq.map(_._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = deg.collect { case (v, d) if d >= 2 =>
      val n = nbrs(v).toSeq.sorted
      val tri = (for (i <- n.indices; j <- i + 1 until n.length)
        yield if (edges.contains((n(i), n(j)))) 1L else 0L).sum
      (v, d, tri, 2L * tri * 1000000L / (d * (d - 1)))
    }.toSet
    val got = q("q_local_clustering").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected && got.nonEmpty)
    got.foreach { case (v, _, _, c) =>
      assert(c >= 0 && c <= 1000000L, s"node $v coeff_ppm out of range")
    }
  }

  test("peaks are strictly above both neighbors in the daily series") {
    val daily = eventsTable(dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum((col("value").cast("decimal(18,2)") * 100).cast("long")).as("c"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    val expected = daily.groupBy(_._1).values.flatMap { g =>
      val ordered = g.sortBy(_._2)
      ordered.indices.collect {
        case i if (i == 0 || ordered(i)._3 > ordered(i - 1)._3) &&
          (i == ordered.length - 1 || ordered(i)._3 > ordered(i + 1)._3) =>
          (ordered(i)._1, ordered(i)._2, ordered(i)._3,
            if (i == 0) -1L else ordered(i - 1)._3,
            if (i == ordered.length - 1) -1L else ordered(i + 1)._3)
      }
    }.toSet
    val got = q("q_peak_detect").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected && got.nonEmpty)
  }
}
