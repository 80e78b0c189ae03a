package graft

import org.apache.spark.sql.functions._

/** q_weighted_sample, q_containment, q_time_weighted_avg: sampling bias
  * + determinism, containment vs jaccard semantics, and a hand-computed
  * TWAP. */
class SamplingScoringSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"
  private def q(key: String) = SparkEntry.queries(key)(spark, dir)

  test("weighted sample is deterministic and selects exactly the k smallest priorities") {
    val a = q("q_weighted_sample").collect().map(_.getLong(0)).toSeq
    val b = q("q_weighted_sample").collect().map(_.getLong(0)).toSeq
    assert(a == b, "sample must be identical across runs")
    assert(a.length == 100)
    // recompute every priority driver-side with the same hash fold and
    // assert the query returned exactly the k smallest
    val M = graft.operators.TextAnalysis.FingerprintMod
    val all = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "n_chars").collect()
      .map { r =>
        val h = r.getLong(0).toString.foldLeft(0L)((acc, c) =>
          java.lang.Math.floorMod(acc * 31L + c.toInt, M))
        val p = BigDecimal(h.toDouble / r.getLong(1).toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (r.getLong(0), p)
      }
    val expect = all.sortBy(x => (x._2, x._1)).take(100).map(_._1).toSeq
    assert(a.sorted == expect.sorted, "sample must be the k smallest h/w priorities")
  }

  test("weighted sample plans as a per-partition top-k, not a global sort") {
    val plan = q("q_weighted_sample").queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"no top-k plan:\n$plan")
  }

  test("containment dominates jaccard and the exact-dup pair scores 1.0") {
    val cont = q("q_containment").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val jac = q("q_ngram_jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // the r9 vacuity fix plants one prefix-positive pair per doc
    // (synthetic id = doc_id + max(doc_id)+1 → doc_id) on top of the
    // jaccard pass's adjacent negatives — split the two populations
    val off = spark.read.parquet(s"$dir/documents.parquet")
      .agg(max("doc_id")).collect()(0).getLong(0) + 1L
    val (planted, negatives) = cont.partition(_._1._1 >= off)
    assert(negatives.keySet == jac.keySet,
      "non-planted candidates must be the same pairs as the jaccard pass")
    assert(planted.nonEmpty, "planted prefix pairs must be present")
    planted.foreach { case (pair, c) =>
      // a prefix's shingles are a contiguous subset of the full doc's
      // → containment exactly 1.0
      assert(c == 1.0, s"$pair: planted prefix pair scored $c, expected 1.0")
    }
    negatives.foreach { case (pair, c) =>
      assert(c >= jac(pair) - 1e-9, s"$pair: containment $c < jaccard ${jac(pair)}")
      assert(c >= 0.0 && c <= 1.0)
    }
    // hand-check one pair from raw text: |sh(A)∩sh(B)| / |sh(A)| over
    // 3-token shingle SETS
    def shingles(text: String): Set[String] = {
      val toks = text.trim.split("\\s+").toSeq
      (1 to math.max(toks.length - 2, 1))
        .map(i => toks.slice(i - 1, i + 2).mkString(" ")).toSet
    }
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id").isin(0L, 1L))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val (sa, sb) = (shingles(texts(0L)), shingles(texts(1L)))
    val hand = BigDecimal(sa.intersect(sb).size.toDouble / sa.size)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(cont((0L, 1L)) - hand) < 1e-9,
      s"pair (0,1): got ${cont((0L, 1L))}, hand-computed $hand")
  }

  test("TWAP matches a driver-side hand computation per user") {
    val rows = SparkEntry.queries("q_sessionize")(spark, dir) // warms events conf
    rows.take(1)
    val ev = eventsTable(dir)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("t"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expect = ev.groupBy(_._2).flatMap { case (user, es) =>
      val sorted = es.sortBy(e => (e._3, e._1))
      val durs = sorted.sliding(2).collect {
        case Array(a, b) => (a._4, b._3 - a._3)
      }.toSeq
      val d = durs.map(_._2).sum
      if (durs.isEmpty || d <= 0) None
      else {
        val wv = durs.map { case (c, dur) => BigInt(c) * BigInt(dur) }.sum
        Some(user -> (durs.length.toLong,
          BigDecimal(wv).toDouble / (100.0 * d.toDouble)))
      }
    }.toMap
    val got = q("q_time_weighted_avg").collect()
    assert(got.length == expect.size)
    got.foreach { r =>
      val (n, twap) = expect(r.getLong(0))
      assert(r.getLong(1) == n, s"user ${r.getLong(0)}: interval count")
      assert(math.abs(r.getDouble(2) - twap) < 1e-5,
        s"user ${r.getLong(0)}: got ${r.getDouble(2)}, expected $twap")
    }
  }

  test("TWAP windows per user only — no global window, no join") {
    val plan = q("q_time_weighted_avg").queryExecution.executedPlan.toString
    assert(plan.contains("Window"), s"expected a per-user window:\n$plan")
    assert(!plan.contains("Join"), s"TWAP needs no join:\n$plan")
  }
}
