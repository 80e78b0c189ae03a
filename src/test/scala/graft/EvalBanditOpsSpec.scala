package graft

import org.apache.spark.sql.functions._

/** Ops 341-344 (round-8 widening, eval/bandit/attribution): simplified
  * silhouette, lead-lag cross-correlation, UCB1 arm ranking, exact
  * Shapley channel attribution — driver replays at sf0.001. */
class EvalBanditOpsSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"

  test("q_silhouette: per-vector a/b replay; partition of the corpus") {
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val cents = graft.operators.IvfIndex.trainReplicable(
      spark.read.parquet(s"$dir/embeddings.parquet"),
      "vec_id", "embedding", nlist = 16, iters = 3, sampleMod = 4)
    // the same left-fold distance + (dist, cid) ordering as nearest_cells
    def d2(v: Array[Float], c: Array[Double]): Double = {
      var acc = 0.0; var j = 0
      while (j < v.length) { val x = v(j).toDouble - c(j); acc += x * x; j += 1 }
      acc
    }
    val rows = vecs.map { case (_, v) =>
      val ds = cents.zipWithIndex.map { case (c, i) => (d2(v, c), i) }
        .sortBy(identity)
      val (da, cid) = (math.sqrt(ds(0)._1), ds(0)._2)
      val db = math.sqrt(ds(1)._1)
      val s = if (math.max(da, db) > 0.0)
        math.floor((db - da) / math.max(da, db) * 1000000.0).toLong else 0L
      cid -> s
    }
    val want = rows.groupBy(_._1).map { case (cid, ss) =>
      val vals = ss.map(_._2)
      val sum = vals.sum
      val mean = if (sum >= 0) sum / vals.length else -((-sum) / vals.length)
      cid.toLong -> (vals.length.toLong, mean, vals.min, vals.max)
    }
    val got = SparkEntry.queries("q_silhouette")(spark, dir).collect()
      .map(r => r.getInt(0).toLong ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == want)
    assert(got.values.map(_._1).sum == vecs.length.toLong,
      "silhouette rows must partition the corpus")
    got.values.foreach { case (_, mean, mn, mx) =>
      assert(mn <= mean && mean <= mx)
      assert(mn >= -1000000L && mx <= 1000000L)
    }
  }

  test("q_cross_corr: dense-grid Pearson replay at every lag") {
    val us = eventsTable(dir)
      .select(unix_micros(col("ts")).as("us"), col("event_type")).collect()
      .map(r => (r.getLong(0) / 86400000000L, r.getString(1)))
    val days = us.map(_._1)
    val (d0, d1) = (days.min, days.max)
    val x = us.filter(_._2 == "view").groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val y = us.filter(_._2 == "purchase").groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val got = SparkEntry.queries("q_cross_corr")(spark, dir).collect()
      .map(r => r.getInt(0) -> (r.getLong(1),
        if (r.isNullAt(2)) Double.NaN else r.getDouble(2))).toMap
    assert(got.keySet == (-7 to 7).toSet)
    (-7 to 7).foreach { lag =>
      val pairs = (d0 to d1).flatMap { d =>
        val dd = d + lag
        if (dd >= d0 && dd <= d1)
          Some((x.getOrElse(d, 0L), y.getOrElse(dd, 0L)))
        else None
      }
      val n = pairs.length.toLong
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      val np = n.toDouble
      val cov = np * sxy.toDouble - sx.toDouble * sy.toDouble
      val vx = np * sxx.toDouble - sx.toDouble * sx.toDouble
      val vy = np * syy.toDouble - sy.toDouble * sy.toDouble
      val (gn, gc) = got(lag)
      assert(gn == n, s"lag $lag n_pairs")
      if (vx > 0.0 && vy > 0.0) {
        val want = BigDecimal(cov / math.sqrt(vx * vy))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(gc == want, s"lag $lag ccf: got $gc want $want")
      } else assert(gc.isNaN, s"lag $lag: degenerate variance must be NULL")
    }
  }

  test("q_ucb_arms: exact-cent replay; rank 1 is the score argmax") {
    val evs = eventsTable(dir).select("event_type", "value").collect()
      .map(r => (r.getString(0),
        (BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP)
          * 100).toLongExact))
    val nn = evs.length.toLong
    val mx = evs.map(_._2).max
    val byArm = evs.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    def r6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = byArm.map { case (arm, cs) =>
      val n = cs.length.toLong
      val mean = cs.sum.toDouble / (n.toDouble * mx.toDouble)
      val bonus = math.sqrt(2.0 * math.log(nn.toDouble) / n.toDouble)
      arm -> (n, r6(mean), r6(bonus), r6(mean + bonus))
    }
    val got = SparkEntry.queries("q_ucb_arms")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getInt(5)))
    assert(got.length == byArm.size)
    got.foreach { case (arm, n, mean, bonus, score, _) =>
      assert((n, mean, bonus, score) == want(arm), s"arm $arm")
    }
    val byRank = got.sortBy(_._6)
    assert(byRank.map(g => (-g._5, g._1)).sorted.map(_._2)
      .sameElements(byRank.map(_._1)),
      "rank must order by (score desc, arm)")
  }

  test("q_shapley_attribution: lattice replay, efficiency, monotonicity") {
    val users = eventsTable(dir).select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val bits = Map("view" -> 1, "click" -> 2, "signup" -> 4, "error" -> 8)
    val convMask = users.values.filter(_.contains("purchase"))
      .map(ts => bits.collect { case (c, b) if ts(c) => b }.sum)
    def v(s: Int): Long = convMask.count(m => (m & s) == m).toLong
    val want = bits.map { case (ch, bit) =>
      val phi = (0 until 16).filter(s => (s & bit) == 0).map { s =>
        val k = Integer.bitCount(s)
        val w = Seq(6, 2, 2, 6)(k)
        w.toLong * (v(s | bit) - v(s))
      }.sum
      ch -> phi
    }
    val got = SparkEntry.queries("q_shapley_attribution")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getLong(3)))
    assert(got.length == 4)
    got.foreach { case (ch, phi, share, nfull) =>
      assert(phi == want(ch), s"channel $ch phi_x24")
      assert(phi >= 0L, "marginals of a monotone game are non-negative")
      assert(nfull == v(15))
      if (v(15) > v(0))
        assert(share == phi * 1000000L / (24L * (v(15) - v(0))))
    }
    assert(got.map(_._2).sum == 24L * (v(15) - v(0)),
      "efficiency: Sum phi*24 = 24*(v(full) - v(empty))")
  }
}
