package graft

import org.apache.spark.sql.functions._

/** Ops 321-324 (round-8 widening, affinity / sketch-set / econometrics):
  * price-volume bridge, Mantel-Haenszel, theta-sketch intersection,
  * collocation LLR — driver replays at sf0.001 with plain Scala
  * collections and BigInt arithmetic. */
class AffinitySketchOpsSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"

  test("q_price_volume_bridge: effects reconcile to the GMV delta exactly") {
    val got = SparkEntry.queries("q_price_volume_bridge")(spark, dir)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(got.nonEmpty)
    got.foreach { case (m, d, p, v, mix, nw, lost, _) =>
      assert(d == p + v + mix + nw - lost,
        s"month $m: delta $d != $p + $v + $mix + $nw - $lost")
    }
    // the bridge sums to GMV(last) - GMV(first): a telescoping identity
    val gmv = spark.read.parquet(s"$dir/lineitem.parquet")
      .select((year(col("l_shipdate")) * 12 + month(col("l_shipdate")) - 1)
        .as("m"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
          .as("r"))
      .groupBy("m").agg(sum("r").as("r")).collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    // every month from first+1..last is a bridge month (dense calendar
    // at this SF), so Σ delta telescopes
    assert(got.map(_._2).sum == gmv.last._2 - gmv.head._2)
  }

  test("q_mantel_haenszel: folds replay against a driver-side 2x2 build") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_orderkey")
      .agg(max((col("l_returnflag") === "R").cast("long")).as("ret"))
    val rows = spark.read.parquet(s"$dir/orders.parquet")
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .join(spark.read.parquet(s"$dir/customer.parquet"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey").cast("long"),
        (col("o_orderpriority") === "1-URGENT").cast("long"), col("ret"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val cells = rows.groupBy(_._1).map { case (_, rs) =>
      val a = rs.count(t => t._2 == 1 && t._3 == 1).toLong
      val b = rs.count(t => t._2 == 1 && t._3 == 0).toLong
      val c = rs.count(t => t._2 == 0 && t._3 == 1).toLong
      val d = rs.count(t => t._2 == 0 && t._3 == 0).toLong
      (a, b, c, d)
    }.filter(t => t._1 + t._2 + t._3 + t._4 > 1).toSeq
    def n(t: (Long, Long, Long, Long)) = t._1 + t._2 + t._3 + t._4
    val num = cells.map(t => BigInt(t._1) * t._4 * 1000000 / n(t)).sum
    val den = cells.map(t => BigInt(t._2) * t._3 * 1000000 / n(t)).sum
    val wantOr = (num * 1000000 / den).toLong
    val ad = cells.map(t => BigInt(t._1) * t._4).sum
    val bc = cells.map(t => BigInt(t._2) * t._3).sum
    val wantCrude = (ad * 1000000 / bc).toLong
    val r = SparkEntry.queries("q_mantel_haenszel")(spark, dir).collect()(0)
    assert(r.getLong(0) == cells.size.toLong)
    assert(r.getLong(2) == wantOr)
    assert(r.getLong(3) == wantCrude)
    // CMH: sanity only (the exact staged fold is the oracle's job) —
    // non-negative and finite
    assert(r.getDouble(4) >= 0.0 && !r.getDouble(4).isNaN)
  }

  test("q_theta_intersect: sketch replay + exact overlap + exact mode") {
    val M = operators.TextAnalysis.FingerprintMod
    val A = BigInt(6364136223846793005L)
    val tu = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_type"), col("user_id")).distinct()
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def h(u: Long): Long = ((BigInt(u) * A).mod(BigInt(M))).toLong
    val byType = tu.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val sk = byType.map { case (t, us) =>
      t -> us.map(h).toSeq.sorted.take(256)
    }
    val theta = sk.map { case (t, hs) =>
      t -> (if (hs.size >= 256) hs.last else M)
    }
    val types = byType.keys.toSeq.sorted
    val want = (for {
      i <- types.indices; j <- (i + 1) until types.size
      ta = types(i); tb = types(j)
    } yield {
      val th = math.min(theta(ta), theta(tb))
      val cnt = (sk(ta).toSet intersect sk(tb).toSet).count(_ < th).toLong
      val est = (BigInt(cnt) * M / th).toLong
      val exact = (byType(ta) intersect byType(tb)).size.toLong
      val err =
        if (exact == 0) 0L
        else if (est >= exact) (est - exact) * 1000000 / exact
        else -((exact - est) * 1000000 / exact)
      (ta, tb, est, exact, err)
    }).toSet
    val got = SparkEntry.queries("q_theta_intersect")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == want)
    // sf0.001 has < 256 distinct users per type => exact mode: est == exact
    if (byType.values.forall(_.size < 256))
      assert(got.forall(t => t._3 == t._4), "exact-mode estimates")
  }

  test("q_collocation_llr: G2 fixed-point fold replays; margins consistent") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("text").collect().map(_.getString(0))
    val bigrams = docs.flatMap { t =>
      val ws = t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      if (ws.length >= 2) ws.sliding(2).map(a => (a(0), a(1))).toSeq
      else Seq.empty
    }
    val k11 = bigrams.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val r1 = bigrams.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val c1 = bigrams.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nn = bigrams.length.toLong
    def xlq(x: Long): BigInt =
      if (x > 0) BigInt(x) * math.floor(math.log(x.toDouble) * 1e6).toLong
      else BigInt(0)
    val want = k11.filter(_._2 >= 5).map { case ((w1, w2), k) =>
      val r = r1(w1); val c = c1(w2)
      val g2 = 2 * (xlq(k) + xlq(r - k) + xlq(c - k) + xlq(nn - r - c + k)
        - xlq(r) - xlq(nn - r) - xlq(c) - xlq(nn - c) + xlq(nn))
      (w1, w2, k, g2.toLong)
    }.toSeq.sortBy(t => (-t._4, t._1, t._2)).take(20)
    val got = SparkEntry.queries("q_collocation_llr")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == want)
    // independence baseline: a pair with k11 ~= E under independence has
    // G2 near 0; the top-ranked pair must dominate it
    assert(got.head._4 >= got.last._4)
  }
}
