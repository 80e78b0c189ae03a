package graft
import org.apache.spark.sql.SparkSession
/** Benchmark main: times each headline query at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. Failures are reported in an "err" map — a broken
  * query is never recorded as a timing. */
object Bench {
  /** Host CPU pressure (PSI `some avg300`) — bench totals on a noisy
    * host swing several-fold, so the JSON records the conditions it ran
    * under. -1 when /proc/pressure is unavailable. */
  private def psiCpuAvg300(): Double =
    try {
      val line = scala.io.Source.fromFile("/proc/pressure/cpu").getLines()
        .find(_.startsWith("some")).getOrElse("")
      "avg300=([0-9.]+)".r.findFirstMatchIn(line).map(_.group(1).toDouble).getOrElse(-1.0)
    } catch { case _: Throwable => -1.0 }

  /** Coarse query families for round-over-round subtotals: the registry
    * grows every round, so per-query comparison breaks, but family
    * subtotals (graph, LSH/dedup, ANN, feeder, series, …) stay
    * comparable. Explicit membership for the iterative/graph sets whose
    * names don't pattern-match; prefix heuristics for the rest. */
  private val graphFamily = Set(
    "q_pagerank", "q_kcore", "q_triangle", "q_assortativity", "q_copurchase",
    "q_local_clustering", "q_link_predict", "q_transition_matrix",
    "q_dedup_clusters", "q_canonical_pick")
  private val lshFamily = Set(
    "q_dedup_exact", "q_dedup_minhash", "q_dedup_simhash", "q_ngram_jaccard",
    "q_dedup_embed", "q_containment", "q_cross_dedup", "q_line_dedup",
    "q_dup_spans", "q_winnow", "q_decontaminate", "q_shingle_novelty",
    "q_semdedup", "q_doc_fingerprint", "q_minhash_est_err", "q_split_leakage",
    "q_dedup_cluster_profile", "q_media_dedup", "q_dedup_threshold_curve",
    "q_dedup_method_agreement")
  private val annFamily = Set(
    "q_ann_topk", "q_ann_lsh", "q_ann_ivf", "q_ann_pq", "q_knn_classify",
    "q_knn_graph", "q_embed_centroid", "q_embed_norm_audit", "q_kmeans_train",
    "q_ann_recall_audit", "q_random_projection", "q_int8_quant_audit",
    "q_embedding_drift", "q_cluster_keywords", "q_ann_ndcg")
  private val feederFamily = Set(
    "q_feeder_load", "q_paged_ingest", "q_zip_extract", "q_pushdown_filter",
    "q_dedup_antijoin", "q_status_map", "q_date_norm", "q_null_norm",
    "q_clamp_truncate", "q_wide_projection", "q_batch_append",
    "q_upsert_q5010", "q_month_repair", "q_wave_sweep", "q_wave_derive",
    "q_jdbc_roundtrip", "q_write_layout", "q_dedup_skipped", "q_upsert_scd2",
    "q_cdc_apply", "q_quota_progress", "q_callback_schedule",
    "q_fieldwork_burndown")
  private val seriesFamily = Set(
    "q_events_window", "q_sessionize", "q_session_window_fn", "q_moving_sum",
    "q_hopping_window", "q_gap_fill", "q_rolling_quantile", "q_rolling_active",
    "q_ewma", "q_autocorr", "q_seasonality", "q_seasonal_decompose",
    "q_drawdown", "q_peak_detect", "q_changepoint", "q_linear_fit",
    "q_burstiness", "q_mom_growth", "q_runs_test", "q_interarrival",
    "q_late_arrival", "q_interval_coverage", "q_throttle", "q_streaks",
    "q_time_weighted_avg", "q_cumulative_distinct", "q_event_downsample",
    "q_stream_dedup", "q_stream_join", "q_incremental_agg", "q_heavy_change",
    "q_seasonal_naive_backtest", "q_coverage_gap", "q_markov_backtest",
    "q_kaplan_meier", "q_dp_release")
  private def familyOf(name: String): String =
    if (graphFamily(name)) "graph"
    else if (lshFamily(name)) "lsh"
    else if (annFamily(name)) "ann"
    else if (feederFamily(name)) "feeder"
    else if (seriesFamily(name)) "series"
    else "other"

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // A stale full record from a previous run must not be mistaken for
    // this run's output if the write below fails.
    try java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get("target/bench_full.json"))
    catch { case _: Throwable => () }
    // Don't start timing on a host still busy with a previous run: PSI
    // avg300 > 0.1 means recent CPU contention distorted-timing risk, so
    // wait (bounded) for the 5-minute average to decay before the first
    // measured query. (The r11 record started at 0.2 — the old gate's
    // boundary — and read 7.6% over the same session's quiet run, so the
    // threshold tightened 0.2 → 0.1.) The bound must outlast the window:
    // avg300 decays ~exp(-t/300), so from 0.8 it needs ~10 min to cross
    // 0.1 — 11×60s covers it. The final JSON still records start/end
    // PSI — this gate makes `psi_noisy: false` the normal case, not a
    // lucky one.
    // SPARK_GRAFT_PSI_WAIT caps the quiet-host wait in minutes (default
    // 11 — enough for avg300 to decay from 0.8). 0 skips the gate for
    // exploratory sweeps that deliberately run concurrent with other
    // work; the recorded start/end PSI still tells the truth about it.
    val psiWaitMax = sys.env.get("SPARK_GRAFT_PSI_WAIT")
      .flatMap(_.toIntOption).getOrElse(11)
    var waited = 0
    while (psiCpuAvg300() > 0.1 && waited < psiWaitMax) {
      System.err.println(s"[bench] host CPU pressure avg300=${psiCpuAvg300()} > 0.1 — waiting 60s")
      Thread.sleep(60000)
      waited += 1
    }
    val psiStart = psiCpuAvg300()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // partitions default to cores for the committed sf0.1 record; at
    // sf100 a 32-way shuffle means ~0.5 GB tasks (oversized sorts,
    // shuffle-hash builds past the per-task budget) — the same lever a
    // real cluster pulls, so large-SF sweeps pass a higher count
    // (SPARK_GRAFT_SHUFFLE_PARTITIONS, resolved inside GraftSession)
    def buildSession(): SparkSession = {
      val s = GraftSession.builder(cpus, cpus)
        .config("spark.sql.adaptive.enabled", "true")
        // SPARK_GRAFT_CODEC=zstd for large-SF sweeps on small local
        // disks: the dedup families shuffle long-hash shingle arrays that
        // zstd packs ~2x tighter than lz4 (committed records keep lz4)
        .config("spark.io.compression.codec",
          sys.env.getOrElse("SPARK_GRAFT_CODEC", "lz4"))
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      // The driver reads the LAST stdout line as the bench record; WARN
      // spam from known-benign sources (bounded driver-side windows, rep-2
      // block re-registration) must not land between the summary line and
      // process exit. These two loggers are the only WARN emitters observed
      // across full runs — everything else stays at WARN so real problems
      // still surface.
      Seq("org.apache.spark.sql.execution.window.WindowExec",
        "org.apache.spark.storage.BlockManager").foreach { l =>
        org.apache.logging.log4j.core.config.Configurator.setLevel(
          l, org.apache.logging.log4j.Level.ERROR)
      }
      // Warm-up: exercise the parquet reader, shuffle machinery, and codegen
      // once so the first timed query doesn't absorb session start-up.
      s.read.parquet(s"$sfDir/orders.parquet")
        .groupBy("o_orderstatus").count().collect()
      s
    }
    var spark = buildSession()
    // One query's fatal error (executor OOM, INTERNAL_ERROR) can stop the
    // whole local SparkContext; without recovery every later query in the
    // run records a bogus "Cannot call methods on a stopped SparkContext"
    // instead of a real reading (the r13 sf100 graph/other20 artifacts).
    // The failed query keeps its real error; the NEXT query gets a fresh
    // session.
    var revived = 0
    def reviveIfDead(): Unit =
      if (spark.sparkContext.isStopped) {
        System.err.println("[bench] SparkContext died — rebuilding session")
        try spark.stop() catch { case _: Throwable => () }
        spark = buildSession()
        revived += 1
      }
    val all = SparkEntry.queries
    val fullSet =
      if (SparkEntry.benchQueries.nonEmpty) SparkEntry.benchQueries
      else all.keys.toSeq.sorted
    // SPARK_GRAFT_BENCH_ONLY=q_a,q_b restricts the run for targeted
    // profiling of one family without paying for the full registry.
    val keys = sys.env.get("SPARK_GRAFT_BENCH_ONLY") match {
      case Some(csv) =>
        val want = csv.split(",").map(_.trim).filter(_.nonEmpty).toSet
        fullSet.filter(want)
      case None => fullSet
    }
    // Each query runs REPS times and reports the min — a single rep on a
    // noisy host can read 10× hot (CPU steal lands on one run), and the
    // min survives a judge re-run. Honest reps: the session cache is
    // cleared first, or rep 2 would reuse rep 1's persisted
    // intermediates (CacheManager matches by canonicalized plan) and the
    // min would skip real work.
    // SPARK_GRAFT_BENCH_REPS=1 for very-large-SF family sweeps where a
    // second rep doubles hours of wall-clock and the goal is
    // Spark-clean + coarse family times, not a committable floor.
    val reps = sys.env.get("SPARK_GRAFT_BENCH_REPS").flatMap(_.toIntOption)
      .filter(_ >= 1).getOrElse(2)
    // Per-rep cleanup depth. The session cache is ALWAYS cleared (honest
    // reps — CacheManager would otherwise hand rep 2 rep 1's persisted
    // intermediates). SPARK_GRAFT_REP_GC additionally:
    //   "1" (default for large-SF sweeps, set by tools/sweep_families.sh):
    //       unpersist leaked RDD blocks AND force a GC so ContextCleaner
    //       DELETES finished queries' shuffle files now — at sf100 the
    //       lingering files of completed queries ate the next query's
    //       spill headroom (r13 disk-wall postmortem).
    //   "0" (default): clearCache only. The forced GC is NOT free at
    //       small SFs: it triggers ContextCleaner shuffle-file deletion
    //       that runs CONCURRENT with the next timed region — the r13
    //       committed sf0.1 record regressed 30% (454 s vs 349 s) with
    //       the per-rep GC on, and the r14 A/B isolated it as the cause.
    //       At sf0.1 the whole run's shuffle files fit the disk, so the
    //       eager cleanup buys nothing there.
    val repGc = sys.env.getOrElse("SPARK_GRAFT_REP_GC", "0") == "1"
    def cleanupBetweenReps(): Unit = {
      spark.catalog.clearCache()
      if (repGc) {
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
        System.gc()
      }
    }
    var times = Vector.empty[(String, Double)]
    var raws = Vector.empty[(String, Seq[Double])]
    var errs = Vector.empty[(String, String)]
    keys.foreach { name =>
      var rep = Vector.empty[Double]
      var failed = false
      (1 to reps).foreach { _ =>
        if (!failed) {
          reviveIfDead()
          cleanupBetweenReps()
          val t0 = System.nanoTime()
          try {
            all(name)(spark, sfDir).write.mode("overwrite").format("noop").save()
            rep :+= (System.nanoTime() - t0) / 1e9
          } catch {
            case e: Throwable =>
              failed = true
              errs :+= name -> Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
          }
        }
      }
      // a query that failed ANY rep is an error, never a timing — a
      // partial min would undercount real work (and the header contract
      // says broken queries don't appear as timings)
      if (rep.nonEmpty && !failed) { times :+= name -> rep.min; raws :+= name -> rep }
      // stderr progress (hour-scale sweeps are otherwise a black box;
      // stdout stays reserved for the one JSON record)
      System.err.println(
        if (failed) s"[bench] $name FAILED: ${errs.last._2.take(100)}"
        else f"[bench] $name ${rep.min}%.2fs")
    }
    def invertedNow(r: Seq[Double]): Boolean =
      r.length >= 2 && r.drop(1).min > r.head * 1.5 && r.drop(1).min - r.head > 0.5
    // One serial quiet-tail re-time of `name`; min survives into the
    // timing. A retry failure keeps the prior reps (already timed twice).
    def retime(name: String): Unit = {
      reviveIfDead()
      cleanupBetweenReps()
      val t0 = System.nanoTime()
      try {
        all(name)(spark, sfDir).write.mode("overwrite").format("noop").save()
        val t = (System.nanoTime() - t0) / 1e9
        raws = raws.map { case (k, r) => if (k == name) k -> (r :+ t) else k -> r }
        times = times.map { case (k, v) => if (k == name) k -> math.min(v, t) else k -> v }
      } catch { case _: Throwable => () }
    }
    // Quiet-tail retry (r9 verdict): queries whose later rep inverted
    // re-time ONCE more after the sweep, when the transient external
    // load that polluted them has had time to clear. The min survives
    // into the timing, and an inversion that disappears on retry stops
    // counting — so BENCH_r{N} doesn't need manual re-timing to be
    // trusted (r9: 7 inversions, all co-load artifacts 2-6× over their
    // isolated times).
    val flagged = raws.filter(kv => invertedNow(kv._2)).map(_._1)
    if (flagged.nonEmpty) {
      System.err.println(s"[bench] quiet-tail retry for ${flagged.size} rep-inverted queries: ${flagged.mkString(",")}")
      flagged.foreach(retime)
    }
    // Both-reps pollution blind spot (r10 verdict): a query polluted in
    // BOTH reps never inverts and keeps its inflated min — BENCH_r10's
    // three slowest readings were 3-8× over their isolated re-runs.
    // Close it two ways, both in the quiet tail where co-load has had
    // the whole sweep to clear: (a) the top-10 slowest re-time serially
    // REGARDLESS of inversion; (b) any query reading >2× its recorded
    // floor (tools/bench_floor.json — the per-query min across prior
    // rounds, merged forward by round_gate.sh from this run's
    // target/bench_floor_next.json) re-times too. A real regression
    // survives the re-run; a co-load artifact evaporates.
    // Floors are per scale factor: the file records its sfDir and is
    // ignored (not clobbered low) when this run measures a different SF.
    val floor: Map[String, Double] = try {
      val p = java.nio.file.Paths.get("tools/bench_floor.json")
      if (java.nio.file.Files.exists(p)) {
        val txt = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        val fileSf = """"_sfdir"\s*:\s*"([^"]+)"""".r
          .findFirstMatchIn(txt).map(_.group(1))
        if (fileSf.forall(_ == sfDir))
          """"([^"_][^"]*)"\s*:\s*([0-9][0-9.eE+-]*)""".r.findAllMatchIn(txt)
            .map(m => m.group(1) -> m.group(2).toDouble).toMap
        else Map.empty
      } else Map.empty
    } catch { case _: Throwable => Map.empty }
    val preTail = times.toMap
    // single-rep sweeps are exploratory (Spark-clean + coarse times) —
    // re-timing the 10 slowest would re-run the most expensive queries
    // at hour scale for a record that isn't a committable floor anyway
    val topSlow =
      if (reps >= 2) times.sortBy(-_._2).take(10).map(_._1) else Vector.empty
    val overFloor = times.collect { case (k, v)
      if floor.get(k).exists(f => v > 2 * f && v - f > 0.5) => k }
    val tailSet = (topSlow ++ overFloor).distinct.filterNot(flagged.contains)
    if (tailSet.nonEmpty) {
      System.err.println(s"[bench] quiet-tail re-time of top-slow/over-floor: ${tailSet.mkString(",")}")
      tailSet.foreach(retime)
    }
    val tailImproved = times.count { case (k, v) =>
      preTail.get(k).exists(p => v < p * 0.67) }
    // next round's floor: min of this run's settled timings and the
    // prior floor — written to target/, merged into tools/ by the gate
    // so the bench never writes into the committed tree itself
    try {
      // sfDir is a filesystem path (no quotes/control chars to escape)
      val merged = (Seq(s""""_sfdir":"$sfDir"""") ++
        (floor.keySet ++ times.map(_._1)).toSeq.sorted.map { k =>
          val v = (floor.get(k).toSeq ++ times.toMap.get(k).toSeq).min
          s""""$k":$v"""
        }).mkString("{", ",", "}")
      java.nio.file.Files.write(
        java.nio.file.Paths.get("target/bench_floor_next.json"),
        merged.getBytes("UTF-8"))
    } catch { case e: Throwable =>
      System.err.println(s"[bench] WARN failed to write bench_floor_next.json: ${e.getMessage}")
    }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    // Keep the stdout line SMALL — and this time provably so. The driver
    // tail-captures only the LAST 2,000 characters of output, and a
    // per-query map over ~200 queries is ~8 KB however tersely printed
    // (rounds 4-7: `parsed: null`, the driver's perf signal blind). The
    // stdout line therefore carries a compact SUMMARY only: totals,
    // counts, mean, the top-10 slowest queries (the ones a reader acts
    // on), and per-family subtotals so round-over-round comparison
    // survives registry growth without per-query parsing. The complete
    // per-query record (full precision, per-rep raws, untruncated
    // errors) lives in target/bench_full.json.
    // Locale.ROOT: the default-locale interpolator would emit a comma
    // decimal separator on non-English JVMs and corrupt the JSON.
    def ms(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val total = times.map(_._2).sum
    val mean = if (times.nonEmpty) total / times.size else 0.0
    val fams = times.groupBy { case (k, _) => familyOf(k) }.toSeq.sortBy(_._1)
      .map { case (f, ts) =>
        s"${jstr(f)}:{\"n\":${ts.size},\"sec\":${ms(ts.map(_._2).sum)}}"
      }.mkString("{", ",", "}")
    val psiEnd = psiCpuAvg300()
    // In-JSON health flag. END pressure is NOT a usable signal: the
    // bench's own local[N] load legally saturates the host, so avg300
    // at exit reads 0.3+ on a perfectly quiet machine (it measured
    // ourselves). External mid-run contention shows instead as REP
    // INVERSION: rep 2 runs against a warmed JVM and should not be
    // slower than rep 1 — a later rep that is >1.5× slower (and by
    // >0.5s absolute, to ignore sub-second jitter) means something else
    // was stealing CPU while it ran. Flag noisy when start pressure was
    // high despite the gate, or >10% of queries inverted.
    val inverted = raws.count(kv => invertedNow(kv._2))
    val noisy = psiStart > 0.3 ||
      (raws.nonEmpty && inverted.toDouble / raws.size > 0.1)
    def summaryLine(topK: Int, errK: Int): String = {
      val q = times.sortBy(-_._2).take(topK)
        .map { case (k, v) => s"${jstr(k)}:${ms(v)}" }.mkString("{", ",", "}")
      val e = errs.take(errK).map { case (k, v) => s"${jstr(k)}:${jstr(v.take(60))}" }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${ms(total)},"unit":"sec","reps":$reps,"n":${times.size},"n_err":${errs.size},"mean_s":${ms(mean)},"queries":$q,"families":$fams,"err":$e,"sf":${jstr(sfDir)},"psi_avg300_start":$psiStart,"psi_avg300_end":$psiEnd,"rep_inversions":$inverted,"tail_retimed":${tailSet.size},"tail_improved":$tailImproved,"psi_noisy":$noisy,"rep_gc":$repGc,"revived":$revived}"""
    }
    // Hard size backstop: if (pathologically long names / error text) the
    // top-10 form still exceeds ~1.8 KB, degrade to top-3/1-err — the
    // driver window is 2,000 chars and the line MUST fit inside it with
    // room for sbt's trailing [success] line.
    val line = {
      val l10 = summaryLine(10, 5)
      if (l10.length <= 1800) l10 else summaryLine(3, 1)
    }
    // the on-disk record is genuinely FULL: full-precision doubles
    // (Double.toString is locale-independent), per-rep raws, and
    // untruncated error messages — it survives even if the driver's
    // stdout capture truncates
    try {
      val fq = times.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
      val fr = raws.map { case (k, v) => s"${jstr(k)}:${v.mkString("[", ",", "]")}" }.mkString("{", ",", "}")
      val fe = errs.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
      val full = s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,"queries":$fq,"queries_reps":$fr,"families":$fams,"err":$fe,"sf":${jstr(sfDir)},"psi_avg300_start":$psiStart,"psi_avg300_end":$psiEnd,"rep_inversions":$inverted,"tail_retimed":${tailSet.size},"tail_improved":$tailImproved,"psi_noisy":$noisy,"rep_gc":$repGc,"revived":$revived}"""
      java.nio.file.Files.write(java.nio.file.Paths.get("target/bench_full.json"),
        full.getBytes("UTF-8"))
    } catch {
      case e: Throwable =>
        // never silent: losing the full record without a trace would make
        // a stale/absent file look like a clean run
        System.err.println(s"[bench] WARN failed to write target/bench_full.json: ${e.getMessage}")
    }
    // stop FIRST, print LAST: SparkContext shutdown can log to stdout,
    // and the summary line must be the final line the driver tails
    spark.stop()
    println(line)
    System.out.flush()
  }
}
