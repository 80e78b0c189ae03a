package graft

import org.apache.spark.sql.functions._

/** q_kcenter_coreset, q_pca_power, q_bfs_hops: driver-side replays of
  * the round-10 coreset/spectral/graph surface. */
class CoresetSpectralOpsSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"
  private def q(key: String) = SparkEntry.queries(key)(spark, dir)

  private lazy val emb: Array[(Long, Array[Float])] =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))

  private def sqDist(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0
    var i = 0
    while (i < a.length) {
      val diff = a(i).toDouble - b(i).toDouble
      d += diff * diff
      i += 1
    }
    d
  }

  test("k-center greedy selection replays; radii are non-increasing") {
    val sorted = emb.sortBy(_._1)
    var centers = Vector((sorted.head._1, sorted.head._2, 0.0))
    for (_ <- 1 to 7) {
      val chosen = centers.map(_._1).toSet
      val next = emb.filter(p => !chosen(p._1))
        .map { case (id, v) => (id, v, centers.map(c => sqDist(v, c._2)).min) }
        .minBy(p => (-p._3, p._1))
      centers = centers :+ next
    }
    val want = centers.zipWithIndex.map { case ((id, _, d), i) =>
      (i.toLong, id, math.rint(d * 1e6) / 1e6)
    }.toSet
    val got = q("q_kcenter_coreset").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want)
    // farthest-point radii can only shrink as coverage grows
    val radii = got.toSeq.sortBy(_._1).map(_._3).drop(1)
    assert(radii.zip(radii.tail).forall { case (a, b) => b <= a },
      s"radii not non-increasing: $radii")
    assert(radii.head > 0.0, "corpus collapsed to one point")
  }

  test("power-iteration direction replays as an exact integer fold") {
    val xq = emb.map { case (_, v) =>
      v.map(e => math.floor(e.toDouble * 1000).toLong)
    }
    var v = Array.fill(64)(1000000L)
    for (_ <- 1 to 3) {
      val u = Array.fill(64)(BigInt(0))
      xq.foreach { x =>
        var sx = 0L
        var i = 0
        while (i < 64) { sx += x(i) * v(i); i += 1 }
        var d = 0
        while (d < 64) { u(d) += BigInt(x(d)) * sx; d += 1 }
      }
      val m = u.map(_.abs).max
      v = u.map(ud => ((ud * 1000000) / m).toLong)
    }
    val want = v.zipWithIndex.map { case (vd, d) => (d.toLong, vd) }.toSet
    val got = q("q_pca_power").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    // a real direction: normalized peak hits exactly 1e6, others vary
    assert(got.map(_._2).max == 1000000L || got.map(_._2).min == -1000000L)
    assert(got.map(_._2).size > 2, "direction degenerate")
  }

  test("BFS hop histogram replays; the frontier actually expands") {
    val items = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val pairs = items.groupBy(_._1).toSeq.flatMap { case (_, its) =>
      val ps = its.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }
    val edges = pairs.groupBy(identity).filter(_._2.size >= 2).keys.toSeq
    val adj = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (v, ns) => v -> ns.map(_._2).toSet }
    val src = adj.keys.min
    var visited = Map(src -> 0L)
    var frontier = Set(src)
    for (h <- 1 to 3) {
      val nw = frontier.flatMap(adj(_)) -- visited.keySet
      visited = visited ++ nw.map(_ -> h.toLong)
      frontier = nw
    }
    val want = visited.values.groupBy(identity)
      .map { case (h, vs) => (h, vs.size.toLong) }.toSet
    val got = q("q_bfs_hops").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    assert(got.exists(r => r._1 > 0 && r._2 > 0), "BFS never left the source")
  }
}
