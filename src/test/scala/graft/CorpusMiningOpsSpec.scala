package graft

import org.apache.spark.sql.functions._

/** q_substring_dedup, q_gopher_rep, q_lpa_communities, q_assoc_rules:
  * driver-side replays of the round-10 corpus-mining surface. */
class CorpusMiningOpsSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"
  private def q(key: String) = SparkEntry.queries(key)(spark, dir)

  private lazy val docs: Array[(Long, String)] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))

  private lazy val orderItems: Array[(Long, Long)] =
    spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))

  test("substring dedup replays on window STRINGS; dup signal is real both ways") {
    val K = 10
    val wins = docs.flatMap { case (id, text) =>
      val t = text.trim.toLowerCase.split("\\s+")
      if (t.length < K) Seq.empty
      else t.sliding(K).map(w => (id, w.mkString(" "))).toSeq
    }
    val docsPerWin = wins.groupBy(_._2).map { case (w, os) =>
      w -> (os.map(_._1).distinct.length >= 2)
    }
    val want = wins.groupBy(_._1).map { case (id, ws) =>
      val nd = ws.count(w => docsPerWin(w._2)).toLong
      (id, ws.length.toLong, nd, nd * 1000000L / ws.length)
    }.toSet
    val got = q("q_substring_dedup").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want)
    // the detector separates: some docs carry cross-doc duplicate runs,
    // some carry none (an all-zero or all-positive column measures nothing)
    assert(got.exists(_._3 > 0), "no duplicated 10-gram anywhere")
    assert(got.exists(_._3 == 0), "every doc flagged — threshold vacuous")
  }

  test("gopher repetition fractions replay; templated docs separate from clean ones") {
    val want = docs.map { case (id, text) =>
      val t = text.trim.toLowerCase.split("\\s+")
      val nt = t.length.toLong
      def top(n: Int): Long =
        if (t.length < n) 0L
        else t.sliding(n).map(_.mkString(" ")).toSeq
          .groupBy(identity).values.map(_.size).max.toLong
      def ppm(c: Long, n: Int): Long = math.min(1000000L, c * n * 1000000L / nt)
      (id, nt, top(2), ppm(top(2), 2), ppm(top(3), 3), ppm(top(4), 4))
    }.toSet
    val got = q("q_gopher_rep").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == want)
    // the signal spreads: repetition fractions differ across the corpus
    assert(got.map(_._4).size > 1 && got.map(_._4).max > got.map(_._4).min)
  }

  test("LPA communities replay a 3-round synchronous driver fold; denser than CC") {
    // co-purchase edges: the operator's exact recipe
    val pairs = orderItems.groupBy(_._1).toSeq.flatMap { case (_, items) =>
      val ps = items.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }
    val edges = pairs.groupBy(identity).filter(_._2.size >= 2).keys.toSeq
    val adj = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (v, ns) => v -> ns.map(_._2) }
    var lbl: Map[Long, Long] = adj.keys.map(v => v -> v).toMap
    for (_ <- 1 to 3) {
      lbl = adj.map { case (v, ns) =>
        val counts = ns.map(lbl).groupBy(identity)
          .map { case (l, os) => (l, os.size) }
        // most frequent neighbor label, ties -> min label
        v -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    val want = lbl.values.groupBy(identity)
      .map { case (c, vs) => (c, vs.size.toLong) }.toSet
    val got = q("q_lpa_communities").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    // communities are real groupings: fewer communities than nodes
    assert(got.size < lbl.size, "every node its own community")
    assert(got.exists(_._2 > 1), "no community ever absorbed a neighbor")
  }

  test("association rules replay support/confidence/lift exactly") {
    val n = orderItems.map(_._1).distinct.length.toLong
    val ci = orderItems.groupBy(_._2).map { case (pk, os) =>
      pk -> os.map(_._1).distinct.length.toLong
    }
    val pairs = orderItems.groupBy(_._1).toSeq.flatMap { case (_, items) =>
      val ps = items.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).collect { case (p, os) if os.size >= 2 =>
      (p._1, p._2, os.size.toLong)
    }.toSeq
    val want = pairs.flatMap { case (a, b, co) =>
      Seq((a, b, co), (b, a, co))
    }.map { case (a, b, co) =>
      val lift = (BigInt(co) * n * 1000000) / (BigInt(ci(a)) * ci(b))
      (a, b, co, co * 1000000L / ci(a), lift.toLong)
    }.toSet
    val got = q("q_assoc_rules").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == want && got.nonEmpty)
    // lift separates positive from negative association
    assert(got.exists(_._5 > 1000000L), "no positively associated rule")
  }
}
