package graft

import org.apache.spark.sql.functions._

/** q_session_window_fn, q_cross_dedup, q_welch_ttest,
  * q_schema_evolution: semantic agreement with their batch siblings /
  * hand recomputation, and the shapes that keep each scale-safe. */
class IncrementalGatesSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"
  private def q(key: String) = SparkEntry.queries(key)(spark, dir)

  private def events = {
    eventsTable(dir)
  }

  // --------------------------------------------------------- session window

  test("session_window sessions agree with the lag-gap sessionizer") {
    // identical gap, no boundary-exact gaps in the fixture ⇒ same count
    val native = q("q_session_window_fn").count()
    val lagged = q("q_sessionize").select("user_id", "session_id").distinct().count()
    assert(native == lagged, s"native $native sessions vs lag-gap $lagged")
  }

  test("sessions are disjoint per user and end = last event + gap") {
    val rows = q("q_session_window_fn").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getTimestamp(2).getTime, r.getLong(3)))
    rows.groupBy(_._1).foreach { case (_, ss) =>
      val sorted = ss.sortBy(_._2).toSeq
      sorted.sliding(2).foreach { w =>
        if (w.size == 2)
          assert(w(0)._3 <= w(1)._2, "sessions of one user must not overlap")
      }
    }
    assert(rows.forall { case (_, s, e, n) => e - s >= 1800000L && n >= 1 },
      "every session spans at least the gap (end = last + gap)")
    assert(rows.map(_._4).sum == events.count(), "every event is in exactly one session")
  }

  // ------------------------------------------------------------ cross dedup

  test("cross dedup rejects every planted corpus copy and admits fresh docs") {
    val out = q("q_cross_dedup").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val planted = out.keys.filter(_ >= 2000000L)
    assert(planted.nonEmpty, "fixture must plant corpus copies")
    planted.foreach { id =>
      assert(!out(id), s"planted copy $id must be rejected (exact dup of corpus)")
    }
    val fresh = out.keys.filter(_ < 2000000L).toSeq
    assert(fresh.nonEmpty && fresh.exists(out(_)), "some fresh docs must be admitted")
    // fresh docs CAN be rejected — the synthetic corpus plants near-dups
    // — but every rejection must be justified by a real j>=0.8 neighbor
    def shingles(text: String): Set[String] =
      text.trim.split("\\s+").toSeq.sliding(3).map(_.mkString(" ")).toSet
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> shingles(r.getString(1))).toMap
    val corpusSh = docs.filter(_._1 % 3 != 0).values.toSeq
    fresh.filterNot(out(_)).foreach { id =>
      val sh = docs(id)
      val hasNeighbor = corpusSh.exists { c =>
        val inter = (sh & c).size
        inter.toDouble / (sh.size + c.size - inter) >= 0.8
      }
      assert(hasNeighbor, s"fresh doc $id rejected without a true near-dup in the corpus")
    }
  }

  test("cross dedup candidate generation is an equi-join, no self-join, no cross join") {
    val plan = q("q_cross_dedup").queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"bucket join must stay an equi-join:\n$plan")
  }

  // ------------------------------------------------------------ Welch t-test

  test("Welch t statistic matches a driver-side recomputation") {
    val raw = events.select("event_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val cut = (raw.map(_._1).min + raw.map(_._1).max) / 2
    // the operator's planted calibration group: view rows cloned as
    // 'calib_shift' with the post-cut half moved +25 (r10 vacuity fix)
    val evs = raw ++ raw.filter(_._2 == "view").map { case (id, _, v) =>
      (id, "calib_shift", if (id > cut) v + 25.0 else v)
    }
    val expected = evs.groupBy(_._2).view.mapValues { g =>
      val (a, b) = g.partition(_._1 <= cut)
      def stats(xs: Array[(Long, String, Double)]) = {
        val vs = xs.map(v => BigDecimal(v._3).setScale(6, BigDecimal.RoundingMode.HALF_UP))
        (vs.length.toLong, vs.sum.toDouble, vs.map(v => v * v).sum.toDouble)
      }
      val (n0, s0, q0) = stats(a); val (n1, s1, q1) = stats(b)
      val v0 = (q0 - s0 * s0 / n0) / (n0 - 1.0); val v1 = (q1 - s1 * s1 / n1) / (n1 - 1.0)
      val t = (s0 / n0 - s1 / n1) / math.sqrt(v0 / n0 + v1 / n1)
      (n0, n1, BigDecimal(t).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toMap
    val got = q("q_welch_ttest").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (t, (n0, n1, ts)) =>
      val (en0, en1, ets) = expected(t)
      assert(n0 == en0 && n1 == en1, s"$t: counts ($n0,$n1) != ($en0,$en1)")
      assert(math.abs(ts - ets) < 2e-6, s"$t: t_stat $ts != $ets")
    }
    // the detector fires on the planted shift — and only there: the
    // natural types draw both halves from one distribution
    val shifts = q("q_welch_ttest").collect()
      .map(r => r.getString(0) -> r.getBoolean(4)).toMap
    assert(shifts("calib_shift"), "planted +25 shift not detected")
  }

  test("Welch moments come from one aggregate pass (no second scan, no window)") {
    val plan = q("q_welch_ttest").queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"no window allowed:\n$plan")
    // one scan for the cut row + one for the moments + one FILTERED scan
    // feeding the planted calib-shift clone (its predicate pushes to the
    // scan, so the re-read is the 'view' slice, not the table) — never a
    // per-half or per-group scan
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans <= 3, s"expected <= 3 scans (cut + moments + calib clone), got $scans:\n$plan")
  }

  // -------------------------------------------------------- schema evolution

  test("mergeSchema read reconciles v1/v2 snapshots; v1 rows carry NULL price") {
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val total = orders.count()
    val v2 = orders.filter(col("o_orderkey") % 10 >= 5).count()
    val out = q("q_schema_evolution").collect()
    assert(out.map(_.getLong(1)).sum == total, "merged view must cover both snapshots")
    assert(out.map(_.getLong(2)).sum == v2,
      "only v2 rows carry the added column (v1 rows read as NULL)")
    assert(out.forall(r => r.getLong(2) < r.getLong(1)),
      "every status has v1 rows, so n_with_price < n")
  }
}
