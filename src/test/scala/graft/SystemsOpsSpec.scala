package graft

import org.apache.spark.sql.functions._

/** q_consistent_hash, q_littles_law, q_knee_point, q_slo_burn:
  * driver-side replays of the round-10 systems-audit surface. */
class SystemsOpsSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"
  private def q(key: String) = SparkEntry.queries(key)(spark, dir)

  private val mod = BigInt("36028797018963913")
  private val m32 = 4294967296L

  test("consistent hashing: resize is minimal — old nodes gain nothing") {
    def vpos(node: Int, rep: Int): Long =
      ((BigInt(node * 16 + rep) * BigInt("2862933555777941757") mod mod)
        mod m32).toLong
    def ring(n: Int) = (for (nd <- 0 until n; r <- 0 until 4)
      yield (vpos(nd, r), nd)).sortBy(_._1)
    def assign(ring: Seq[(Long, Int)], k: Long): Int =
      ring.find(_._1 >= k).getOrElse(ring.head)._2
    val (r8, r9) = (ring(8), ring(9))
    val keys = spark.read.parquet(s"$dir/customer.parquet")
      .selectExpr("c_custkey").collect().map(_.getLong(0))
      .map(k => ((BigInt(k) * BigInt("6364136223846793005") mod mod)
        mod m32).toLong)
    val rows = keys.map(k => (assign(r8, k), assign(r9, k)))
    val nodes = (0 to 8).map { n =>
      (n.toLong, rows.count(_._1 == n).toLong, rows.count(_._2 == n).toLong,
        rows.count(p => p._2 == n && p._1 != n).toLong)
    }.filter(r => r._2 > 0 || r._3 > 0).toSet
    val got = q("q_consistent_hash").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == nodes)
    // the consistent-hashing guarantee: keys only move TO the new node
    assert(got.filter(_._1 != 8L).forall(_._4 == 0L),
      "an old node gained keys on resize — ring assignment broken")
    assert(got.find(_._1 == 8L).exists(_._4 > 0L), "new node got nothing")
  }

  test("Little's law panel: L equals lambda*W and peak >= average") {
    val r = q("q_littles_law").collect().head
    val (n, span, meanDur, lAvg, peak) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(n > 0 && span > 0 && meanDur >= 0)
    // L = λW: l_avg = (n/span)·(Σdur/n) = Σdur/span — check within the
    // two-division quantization (each floor loses < 1 unit)
    val sess = eventsTable(dir)
      .selectExpr("user_id", "event_id", "unix_micros(ts) AS t").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
      .groupBy(_._1).values.flatMap { es =>
        val sorted = es.sortBy(e => (e._3, e._2))
        // rebuild sessions by 30-minute gap
        var out = Vector.empty[(Long, Long)]
        var st = sorted.head._3; var en = sorted.head._3
        for (e <- sorted.drop(1)) {
          if (e._3 - en > 1800000000L) { out :+= ((st, en)); st = e._3 }
          en = e._3
        }
        (out :+ ((st, en))).toSeq
      }.toSeq
    assert(n == sess.length.toLong)
    val sd = sess.map(s => BigInt(s._2 - s._1)).sum
    assert(lAvg == (sd * 1000 / BigInt(span).max(1)).toLong)
    assert(meanDur == (sd / n).toLong)
    // peak concurrency bounds the time average
    assert(peak * 1000L >= lAvg, s"peak $peak below average $lAvg milli")
    // replay peak by sweep
    val bounds = sess.flatMap(s => Seq((s._1 * 4 + 1, 1L), ((s._2 + 1) * 4, -1L)))
      .sortBy(_._1)
    var cur = 0L; var pk = 0L
    for ((_, d) <- bounds) { cur += d; pk = math.max(pk, cur) }
    assert(peak == pk)
  }

  test("knee point replays; flag marks the max-gap bucket") {
    val got = q("q_knee_point").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).sortBy(_._1)
    assert(got.length == 20)
    // curve is concave-ish: y >= x everywhere (top buckets first)
    assert(got.forall(r => r._4 >= 0L), "y below diagonal — bucket order inverted")
    val maxDiff = got.map(_._4).max
    val knees = got.filter(_._5)
    assert(knees.length == 1 && knees.head._4 == maxDiff)
    assert(knees.head._1 ==
      got.filter(_._4 == maxDiff).map(_._1).min, "tiebreak not min bucket")
    // x_ppm is monotone and ends at ~1e6
    assert(got.last._2 == 1000000L)
  }

  test("SLO burn windows nest and the burn math replays") {
    val got = q("q_slo_burn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(1L, 6L, 24L, 720L))
    // nesting: wider windows contain at least as many events
    assert(got.map(_._2).toSeq == got.map(_._2).sorted.toSeq)
    for (r <- got) {
      assert(r._4 == r._3 * 1000000L / r._2)
      assert(r._5 == r._4 / 10L)
      assert(r._2 >= r._3)
    }
    // the fixture's ~20% error type burns hot over the full span (the
    // 1h window can hold a single non-error event at sf0.001)
    assert(got.last._5 > 1000L, "full-span burn below 1x — error type missing?")
  }
}
