package graft

import org.apache.spark.sql.functions._

/** q_mixing_weights, q_zipf_fit, q_burstiness on the sf0.001 fixtures. */
class MixingZipfSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"
  private def q(key: String) = SparkEntry.queries(key)(spark, dir)

  private def events = {
    eventsTable(dir)
  }

  test("mixing weights compress the share range toward the tail (T=2)") {
    val rows = q("q_mixing_weights").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    assert(rows.map(_._2).sum == docs.count(), "doc counts partition the corpus")
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-3, "raw shares sum to 1")
    assert(math.abs(rows.map(_._5).sum - 1.0) < 1e-3, "temp shares sum to 1")
    rows.foreach { case (src, _, tokens, raw, temp, up) =>
      val wantTemp = math.sqrt(tokens.toDouble) /
        rows.map(r => math.sqrt(r._3.toDouble)).sum
      assert(math.abs(temp - wantTemp) < 1e-4, s"$src temp share")
      assert(math.abs(up - temp / raw) < 1e-3, s"$src upsample factor")
    }
    // temperature flattening: small sources upsample (>1), big downsample
    val smallest = rows.minBy(_._3)
    val biggest = rows.maxBy(_._3)
    assert(smallest._6 > 1.0 && biggest._6 < 1.0,
      "sqrt sampling upweights the tail and downweights the head")
  }

  test("zipf fit: negative slope, strong fit, 200 terms") {
    val row = q("q_zipf_fit").collect() match { case Array(r) => r }
    val (n, slope, r2) = (row.getLong(0), row.getDouble(1), row.getDouble(2))
    val vocab = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("t"))
      .select("t").distinct().count()
    assert(n == math.min(200L, vocab), "panel is the top-200-capped vocabulary")
    assert(slope < 0.0 && slope > -3.0, s"slope $slope (freq-desc rank ⇒ ≤ 0)")
    assert(r2 >= 0.0 && r2 <= 1.0, s"R² $r2 in range")
    // the synthetic corpus draws tokens near-uniformly — a NATURAL corpus
    // slopes ≈ −1 with high R²; here the gate must report the opposite
    assert(slope > -0.5 && r2 < 0.5,
      s"uniform synthetic vocabulary must fail the naturalness bar ($slope, $r2)")
  }

  test("burstiness matches a driver-side dense-grid replay") {
    val rows = q("q_burstiness").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val ev = events.select(col("event_type"),
        expr("unix_micros(ts) div 3600000000").as("hr")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    rows.foreach { case (t, nHours, mean, fano) =>
      val hrs = ev.filter(_._1 == t).map(_._2)
      val (h0, h1) = (hrs.min, hrs.max)
      val counts = (h0 to h1).map(h => hrs.count(_ == h).toLong)
      assert(nHours == counts.length, s"$t dense span")
      val (n, s1) = (counts.length.toLong, counts.sum)
      val s2 = counts.map(c => BigInt(c) * c).sum
      val wantMean = BigDecimal(s1.toDouble / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val wantFano = BigDecimal(
        (BigInt(n) * s2 - BigInt(s1) * BigInt(s1)).toDouble / (n.toDouble * s1.toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(mean == wantMean, s"$t mean $mean != $wantMean")
      assert(math.abs(fano - wantFano) < 1e-9, s"$t fano $fano != $wantFano")
      assert(fano > 0.0)
    }
    assert(rows.nonEmpty)
  }
}
