package graft

import org.apache.spark.sql.functions._

/** q_train_split, q_hopping_window, q_percentile_bucket, q_mad_outlier,
  * q_drift_psi, q_knn_classify: hand-computed expectations on the
  * sf0.001 fixtures plus the plan shapes that keep each scale-safe
  * (map-only assignment, broadcast stats rows, bounded vote joins).
  */
class CurationAnalyticsSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"
  private def q(key: String) = SparkEntry.queries(key)(spark, dir)

  private def docs = spark.read.parquet(s"$dir/documents.parquet")
  private def events = {
    eventsTable(dir)
  }

  // ------------------------------------------------------------ train split

  test("train split partitions the corpus at ~98/1/1 and is re-derivable by hand") {
    val out = q("q_train_split").collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val total = docs.count()
    assert(out.values.map(_._1).sum == total, "splits must partition the corpus")
    val bySplit = out.groupBy(_._1._1).view.mapValues(_.values.map(_._1).sum).toMap
    assert(bySplit("train") > (total * 0.9).toLong, s"train too small: $bySplit")
    assert(bySplit.keySet == Set("train", "val", "test"), s"missing split: $bySplit")
    // membership is a pure function of doc_id: recompute one doc by hand
    val d = docs.select("doc_id", "lang", "n_chars").head()
    val b = ((d.getLong(0) % 1000003L) * 1103515247L + 12345L) % 1000L
    val expected = if (b < 980) "train" else if (b < 990) "val" else "test"
    assert(out.contains((expected, d.getString(1))),
      s"hand-derived split $expected for doc ${d.getLong(0)} absent from output")
  }

  test("train split is one map-side-combinable aggregate (no join, no window)") {
    val plan = q("q_train_split").queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Window"),
      s"split assignment must be map-only:\n$plan")
  }

  // -------------------------------------------------------- hopping window

  test("hopping window: every event lands in exactly windowDur/slide = 2 windows") {
    val out = q("q_hopping_window")
    assert(out.agg(sum("n")).head().getLong(0) == 2 * events.count())
    // starts are slide-aligned (300 s)
    val misaligned = out.select(unix_micros(col("window_start")).as("us"))
      .filter(pmod(col("us"), lit(300000000L)) =!= 0).count()
    assert(misaligned == 0, "window starts must align to the 5-minute slide")
  }

  test("hopping window totals are consistent with the tumbling hourly view") {
    // both views sum value over all events (each window counts it w/s
    // times in the hopping view)
    val hop = q("q_hopping_window").agg(sum("total_value")).head().getDouble(0)
    val full = events.agg(sum(col("value").cast("decimal(18,2)")))
      .head().getDecimal(0).doubleValue()
    assert(math.abs(hop - 2 * full) < 1e-6, s"hopping sum $hop != 2·$full")
  }

  // ---------------------------------------------------- percentile buckets

  test("percentile buckets partition the corpus with ordered boundaries") {
    val out = q("q_percentile_bucket").collect()
    assert(out.map(_.getLong(2)).sum == docs.count())
    val buckets = out.groupBy(_.getInt(1))
    assert(buckets.keySet == Set(0, 1, 2, 3), s"got buckets ${buckets.keySet}")
    // global boundaries: every bucket-b doc is shorter than every
    // bucket-(b+1) doc, whatever the language
    for (b <- 0 to 2) {
      val maxLo = buckets(b).map(_.getLong(3 + 1)).max      // max_chars
      val minHi = buckets(b + 1).map(_.getLong(3)).min      // min_chars
      assert(maxLo < minHi, s"bucket $b max $maxLo !< bucket ${b + 1} min $minHi")
    }
  }

  test("percentile bucketing broadcasts the bounds row (no ntile window)") {
    val plan = q("q_percentile_bucket").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"quartile bounds must broadcast:\n$plan")
    assert(!plan.contains("Window"), s"no global-order window allowed:\n$plan")
  }

  // --------------------------------------------------------- MAD outliers

  /** Exact interpolated median, Spark `percentile` semantics. */
  private def medianOf(xs: Array[Double]): Double = {
    val v = xs.sorted
    val pos = 0.5 * (v.length - 1)
    val (f, c) = (math.floor(pos), math.ceil(pos))
    if (f == c) v(pos.toInt)
    else (c - pos) * v(f.toInt) + (pos - f) * v(c.toInt)
  }

  test("MAD outlier stats match a hand computation per event type") {
    val byType = events.select("event_type", "value").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1))).toMap
    val got = q("q_mad_outlier").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got.keySet == byType.keySet)
    byType.foreach { case (t, vs) =>
      val med = medianOf(vs)
      val mad = medianOf(vs.map(v => math.abs(v - med)))
      val outliers = vs.count(v => math.abs(v - med) > 3.0 * 1.4826 * mad)
      val (n, nOut, gMed, gMad) = got(t)
      assert(n == vs.length && nOut == outliers, s"$t: ($n,$nOut) != (${vs.length},$outliers)")
      assert(math.abs(gMed - med) < 1e-9 && math.abs(gMad - mad) < 1e-9,
        s"$t: med/mad ($gMed,$gMad) != ($med,$mad)")
    }
  }

  test("MAD band shrugs off a wild value that would drag a z-score band") {
    // one 1e9 outlier among 101 values: median/MAD barely move, so only
    // the wild value itself is flagged; mean/stddev would flag nothing
    // (the outlier inflates stddev past every deviation)
    val vs = (0 until 100).map(i => 10.0 + (i % 11)).toArray :+ 1e9
    val med = medianOf(vs)
    val mad = medianOf(vs.map(v => math.abs(v - med)))
    val flagged = vs.filter(v => math.abs(v - med) > 3.0 * 1.4826 * mad)
    assert(flagged.sameElements(Array(1e9)), s"robust band flagged ${flagged.toSeq}")
    val mean = vs.sum / vs.length
    val sd = math.sqrt(vs.map(v => (v - mean) * (v - mean)).sum / vs.length)
    assert(!vs.exists(v => v != 1e9 && math.abs(v - mean) > 3 * sd) &&
      math.abs(1e9 - mean) > 3 * sd, "premise: z-score flags only via the outlier")
  }

  // ------------------------------------------------------------ drift PSI

  test("drift PSI is nonnegative, finite, and covers every event") {
    val out = q("q_drift_psi").collect()
    assert(out.map(r => r.getLong(1) + r.getLong(2)).sum == events.count())
    out.foreach { r =>
      val psi = r.getDouble(3)
      assert(!psi.isNaN && !psi.isInfinite && psi >= -1e-6,
        s"${r.getString(0)}: psi=$psi (PSI terms (p-q)·ln(p/q) are pairwise >= 0)")
    }
  }

  test("PSI formula: identical halves score 0, a shifted half scores big") {
    def psi(c0: Array[Long], c1: Array[Long]): Double = {
      val (n0, n1) = (c0.sum, c1.sum)
      c0.indices.map { i =>
        val p = (c0(i) + 1.0) / (n0 + 10.0)
        val q = (c1(i) + 1.0) / (n1 + 10.0)
        math.floor((p - q) * math.log(p / q) * 1e9) / 1e9
      }.sum
    }
    val flat = Array.fill(10)(100L)
    assert(math.abs(psi(flat, flat)) < 1e-6)
    val shifted = Array.tabulate(10)(i => if (i < 5) 20L else 180L)
    assert(psi(flat, shifted) > 0.2, "a real distribution shift must trip the 0.2 gate")
  }

  // --------------------------------------------------------------- KS test

  test("KS statistic matches a driver-side recomputation in exact rationals") {
    val evs = events.select("event_id", "value").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val cut = (evs.map(_._1).min + evs.map(_._1).max) / 2
    val sorted = evs.sortBy { case (id, v) => (v, id) }
    val n0 = evs.count(_._1 <= cut).toLong
    val n1 = evs.length - n0
    var c0 = 0L; var c1 = 0L; var num = 0L
    sorted.foreach { case (id, _) =>
      if (id <= cut) c0 += 1 else c1 += 1
      num = math.max(num, math.abs(c0 * n1 - c1 * n0))
    }
    val r = q("q_ks_test").head()
    assert((r.getLong(0), r.getLong(1)) == ((n0, n1)))
    val expected = BigDecimal(num.toDouble / (n0.toDouble * n1.toDouble))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(2) == expected, s"ks ${r.getDouble(2)} != $expected")
  }

  test("KS runs on the distributed scan — no unpartitioned window") {
    val plan = q("q_ks_test").queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"running ranks must come from the two-phase scan:\n$plan")
  }

  // --------------------------------------------------------- kNN classify

  test("kNN classification matches a driver-side brute-force recomputation") {
    val all = spark.read.parquet(s"$dir/embeddings.parquet").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = all.filter(_._1 < 16).map { case (qid, qv, _) =>
      val ranked = all.filter(_._1 != qid)
        .map { case (id, v, lab) => (BigDecimal(cos(qv, v)).setScale(6, BigDecimal.RoundingMode.HALF_UP), id, lab) }
        .sortBy { case (c, id, _) => (-c, id) }.take(5).zipWithIndex
      val byLabel = ranked.groupBy(_._1._3).view
        .mapValues(g => (g.length, g.map(_._2).min)).toMap
      val (label, (votes, _)) = byLabel.toSeq
        .sortBy { case (lab, (v, r)) => (-v, r, lab) }.head
      qid -> ((label, votes))
    }.toMap
    val got = q("q_knn_classify").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(got == expected, s"kNN mismatch: $got vs $expected")
  }

  test("kNN vote join is bounded: neighbor set broadcasts, corpus never shuffles twice") {
    val plan = q("q_knn_classify").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"|probes|·k neighbor rows must broadcast into the label join:\n$plan")
  }
}
