package graft

import org.apache.spark.sql.functions._

/** Ops 337-340 (round-8 widening, causal blocking / web pipeline /
  * risk): stratified ATE, HTML strip, sample-size table, Gumbel fit —
  * driver replays at sf0.001. */
class CausalRiskOpsSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"

  test("q_stratified_ate: block-weighted fold replays; adjusts the naive gap") {
    val cust = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey"),
        (col("c_mktsegment") === "BUILDING").cast("long"),
        (col("c_acctbal").cast("decimal(18,2)") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._3, t._1))
    val nAll = cust.length.toLong
    val decile = cust.zipWithIndex.map { case ((ck, t, _), i) =>
      ck -> (t, i.toLong * 10 / nAll)
    }.toMap
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_custkey"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .map { case (ck, y) => val (t, d) = decile(ck); (d, t, y) }
    val cells = orders.groupBy(_._1).map { case (d, rs) =>
      val tr = rs.filter(_._2 == 1); val cr = rs.filter(_._2 == 0)
      (d, tr.size.toLong, cr.size.toLong,
        BigInt(tr.map(_._3).sum), BigInt(cr.map(_._3).sum))
    }.filter(c => c._2 > 0 && c._3 > 0).toSeq
    val nOrders = cells.map(c => c._2 + c._3).sum
    val w = cells.map { case (_, nt, nc, st, sc) =>
      BigInt(nt + nc) * (st * 1000000 / nt - sc * 1000000 / nc)
    }.sum
    val ate = (if (w >= 0) w / nOrders else -((-w) / nOrders)).toLong
    val sta = cells.map(_._4).sum; val nta = cells.map(_._2).sum
    val sca = cells.map(_._5).sum; val nca = cells.map(_._3).sum
    val naive = (sta * 1000000 / nta - sca * 1000000 / nca).toLong
    val r = SparkEntry.queries("q_stratified_ate")(spark, dir).collect()(0)
    assert(r.getLong(0) == cells.size.toLong)
    assert(r.getLong(1) == nOrders)
    assert(r.getLong(2) == ate)
    assert(r.getLong(3) == naive)
  }

  test("q_html_strip: the real regex chain recovers exactly the text") {
    val got = SparkEntry.queries("q_html_strip")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(got.nonEmpty)
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    got.foreach { case (id, hlen, clen, rem, ok) =>
      assert(ok, s"doc $id: script/tag residue survived the strip")
      val t = texts(id)
      val want = 95 + 2 * id.toString.length + (id % 7).toString.length +
        t.length
      assert(hlen == want, s"doc $id html_len")
      assert(clen == 2 + t.replaceAll("\\s+", " ").trim.length)
      assert(rem == hlen - clen)
    }
  }

  test("q_power_mde: the n(MDE) curve replays and scales inversely") {
    val ev = eventsTable(dir).select(
      count(lit(1)), sum((col("event_type") === "purchase").cast("long")))
      .collect()(0)
    val n = ev.getLong(0); val k = ev.getLong(1)
    val pPpm = k * 1000000 / n
    val p = pPpm / 1e6
    val zsum = 2.801586
    val got = SparkEntry.queries("q_power_mde")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.map(_._1) sameElements Array(50000L, 100000L, 200000L, 500000L))
    got.foreach { case (mde, ne, pp, narm) =>
      assert(ne == n && pp == pPpm)
      val delta = p * (mde / 1e6)
      val want = math.ceil(zsum * zsum * 2.0 * p * (1.0 - p) /
        (delta * delta)).toLong
      assert(narm == want, s"mde $mde")
    }
    // quadrupling the MDE divides n by ~16 (inverse-square law)
    val n5 = got.find(_._1 == 50000L).get._4
    val n20 = got.find(_._1 == 200000L).get._4
    assert(math.abs(n5 / 16.0 - n20) <= 1.0)
  }

  test("q_gumbel_fit: moment fit replays; return level exceeds the max") {
    val daily = spark.read.parquet(s"$dir/orders.parquet")
      .select(to_date(col("o_orderdate")).as("dt"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum / 100000L)
    val mx = daily.toSeq
      .groupBy(t => t._1.getYear * 12 + t._1.getMonthValue - 1)
      .view.mapValues(_.map(_._2).max).values.toSeq
    val n = mx.size.toLong; val s = mx.sum; val q = mx.map(x => x * x).sum
    val sd = math.sqrt((n.toDouble * q - s.toDouble * s) /
      (n.toDouble * (n - 1.0)))
    val scale = 0.779697 * sd
    val loc = s.toDouble / n - 0.577216 * scale
    val rl = loc + 4.600149 * scale
    val r = SparkEntry.queries("q_gumbel_fit")(spark, dir).collect()(0)
    assert(r.getLong(0) == n)
    assert(r.getLong(1) == mx.max)
    assert(math.abs(r.getDouble(2) - loc) < 1e-4)
    assert(math.abs(r.getDouble(3) - scale) < 1e-4)
    assert(math.abs(r.getDouble(4) - rl) < 1e-4)
    // the 100-month return level must sit above the observed max over
    // far fewer months
    assert(r.getDouble(4) > r.getLong(1).toDouble * 0.9)
  }
}
