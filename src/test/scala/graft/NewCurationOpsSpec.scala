package graft

import org.apache.spark.sql.functions._

/** Ops 207-213 (round-8 widening): deterministic sampling/splitting,
  * sketch-based statistics, estimator calibration, and the JL
  * projection audit — each replayed independently on the driver at
  * sf0.001 (the CorpusBuildSpec discipline: the spec recomputes the
  * answer with plain Scala collections, not a second Spark plan). */
class NewCurationOpsSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"
  private val A = BigInt(6364136223846793005L)
  private val M = BigInt(36028797018963913L)
  private def mh(x: Long): Long = ((BigInt(x) * A).mod(M)).toLong

  private lazy val docs: Seq[(Long, String, String)] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq

  test("q_reservoir_sample equals the driver bottom-k-by-hash replay") {
    val want = docs.groupBy(_._2).flatMap { case (lang, ds) =>
      ds.map(d => (mh(d._1), d._1)).sorted.take(5).zipWithIndex
        .map { case ((_, id), i) => (lang, i + 1, id) }
    }.toSet
    val got = SparkEntry.queries("q_reservoir_sample")(spark, dir)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("q_stratified_kfold: folds partition the corpus; deviations match the replay") {
    val folds = docs.map(d => (mh(d._1) % 5, d._2))
    val n = folds.size.toLong
    val byLang = folds.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val want = folds.groupBy(_._1).map { case (f, ds) =>
      val nf = ds.size.toLong
      val dev = ds.groupBy(_._2).map { case (lang, ls) =>
        math.abs(ls.size.toLong * 1000000L / nf - byLang(lang) * 1000000L / n)
      }.max
      (f.toInt, nf, dev)
    }.toSet
    val got = SparkEntry.queries("q_stratified_kfold")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    assert(got.toSeq.map(_._2).sum == n, "folds must partition the corpus")
  }

  test("q_heavy_change equals the driver midpoint-split replay") {
    val ev = eventsTable(dir).select(col("user_id"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val mid = (ev.map(_._2).min + ev.map(_._2).max) / 2
    val want = ev.groupBy(_._1).map { case (u, es) =>
      val n1 = es.count(_._2 < mid).toLong
      val n2 = es.count(_._2 >= mid).toLong
      (u, n1, n2, math.abs(n2 - n1))
    }.toSeq.sortBy(t => (-t._4, t._1)).take(10)
    val got = SparkEntry.queries("q_heavy_change")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(t => (-t._4, t._1))
    assert(got == want)
  }

  test("q_join_card_est matches the driver KMV replay; estimate is in the right decade") {
    val oa = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey").collect().map(_.getLong(0)).distinct.map(mh).toSet
    val lb = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey").collect().map(_.getLong(0)).distinct.map(mh).toSet
    val union = (oa ++ lb).toSeq.sorted
    val bottom = union.take(256)
    val kUsed = bottom.size.toLong
    val kBoth = bottom.count(h => oa(h) && lb(h)).toLong
    val estUnion =
      if (kUsed < 256) kUsed
      else ((BigInt(kUsed - 1) * M) / BigInt(bottom.last)).toLong
    val estInter = (BigInt(kBoth) * estUnion / BigInt(kUsed)).toLong
    val exactInter = (oa & lb).size.toLong
    val row = SparkEntry.queries("q_join_card_est")(spark, dir)
      .collect() match { case Array(r) => r }
    assert(row.getLong(0) == kUsed)
    assert(row.getLong(1) == kBoth)
    assert(row.getLong(2) == union.size.toLong)
    assert(row.getLong(3) == exactInter)
    assert(row.getLong(4) == estUnion)
    assert(row.getLong(5) == estInter)
    // KMV with k=256 has ~1/sqrt(255) ≈ 6% relative error; 50% is the
    // loose "not broken" band that survives any testdata regeneration
    assert(exactInter == 0 ||
      math.abs(estInter - exactInter).toDouble / exactInter < 0.5,
      s"est $estInter vs exact $exactInter")
  }

  test("q_minhash_est_err matches the driver signature replay") {
    val u = graft.functions.NativeText.SimHashUniv
    def shingles(text: String): Seq[String] = {
      val toks = text.trim.split("\\s+").toSeq
      val k = 3
      (0 to math.max(toks.size - k, 0))
        .map(i => toks.slice(i, i + k).mkString(" ")).distinct
    }
    def base(sh: String): Long =
      sh.foldLeft(0L)((a, c) => (a * 31 + c.toInt) % u.P)
    def sig(ss: Seq[String]): Seq[Long] = {
      val bh = ss.map(base)
      (0 until 32).map(j => bh.map(h => (h * u.a(j) + u.b(j)) % u.P).min)
    }
    val byId = docs.map(d => d._1 -> d._3).toMap
    val want = docs.map(_._1).filter(id => id % 2 == 0 && byId.contains(id + 1))
      .map { a =>
        val (sa, sb) = (shingles(byId(a)), shingles(byId(a + 1)))
        val nm = sig(sa).zip(sig(sb)).count { case (x, y) => x == y }.toLong
        val li = (sa.toSet & sb.toSet).size.toLong
        val un = sa.size + sb.size - li
        val est = nm * 1000000L / 32
        val jac = li * 1000000L / un
        (a, a + 1, nm.toInt, est, jac, math.abs(est - jac))
      }.toSet
    val got = SparkEntry.queries("q_minhash_est_err")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("q_random_projection matches the driver replay; JL ratio is centred on 1") {
    val rows = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("label"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    def signPos(i: Int, j: Int): Boolean =
      ((BigInt((i * 8 + j).toLong) * A).mod(M) % 2) == 0
    val perVec = rows.flatMap { case (_, label, v) =>
      val q = v.map(x => math.floor(x.toDouble * 1e6).toLong)
      val o = q.map(x => x * x).sum
      if (o <= 0) None else {
        val p = (0 until 8).map { j =>
          val pj = q.indices.map(i => if (signPos(i, j)) q(i) else -q(i)).sum
          pj * pj
        }.sum
        Some(label -> (BigInt(p) * 1000000 / (8 * BigInt(o))).toLong)
      }
    }
    val want = perVec.groupBy(_._1).map { case (label, rs) =>
      val v = rs.map(_._2)
      (label, v.size.toLong, v.sum / v.size, v.min, v.max)
    }.toSet
    val got = SparkEntry.queries("q_random_projection")(spark, dir)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == want)
    // JL with 8 output dims is noisy per vector but unbiased: label
    // averages should sit well within a factor of 2 of 1e6
    got.foreach { case (_, _, avg, _, _) =>
      assert(avg > 500000L && avg < 2000000L, s"avg ratio $avg")
    }
  }

  test("q_kmeans_train: clusters partition the corpus with sane inertia") {
    val rs = SparkEntry.queries("q_kmeans_train")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(rs.map(_._2).sum == n, "clusters must partition the corpus")
    assert(rs.forall(r => r._1 >= 0 && r._1 < 16))
    assert(rs.forall(_._3 >= 0L))
    assert(rs.length > 1, "a one-cluster quantizer clusters nothing")
  }

  test("q_ann_recall_audit: recall is a valid fraction over k=5 and not degenerate") {
    val rs = SparkEntry.queries("q_ann_recall_audit")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rs.length == 8)
    rs.foreach { case (_, hit, ppm) =>
      assert(hit >= 0 && hit <= 5)
      assert(ppm == hit * 1000000L / 5)
    }
    // nprobe=4/16 must beat random cell selection by a wide margin:
    // random probing recalls ~4/16 = 25%; require a 40% mean floor
    assert(rs.map(_._3).sum / rs.length >= 400000L,
      s"mean recall ${rs.map(_._3).sum / rs.length}")
  }

  test("q_ngram_coverage: monotone curve ending at full coverage") {
    val rs = SparkEntry.queries("q_ngram_coverage")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(rs.nonEmpty)
    assert(rs.sliding(2).forall { case Array(a, b) => a._3 <= b._3; case _ => true },
      "coverage must be monotone in vocab size")
    val nTypes = rs.head._2
    if (nTypes <= 800)
      assert(rs.last._1 == nTypes && rs.last._3 == 1000000L,
        "full-vocab row must cover everything")
  }

  test("q_int8_quant_audit matches the driver replay") {
    val rows = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("label"), col("embedding"))
      .collect().map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
    val per = rows.flatMap { case (label, v) =>
      val amax = v.foldLeft(0.0)((m, x) => math.max(m, math.abs(x.toDouble)))
      if (amax <= 0.0) None else {
        val err = v.foldLeft(0.0) { (acc, xf) =>
          val x = xf.toDouble
          acc + math.abs(x - math.floor(x * 127.0 / amax + 0.5) * amax / 127.0)
        }
        Some(label -> math.floor(err * 1e9).toLong)
      }
    }
    val want = per.groupBy(_._1).map { case (l, es) =>
      val v = es.map(_._2)
      (l, v.size.toLong, v.sum / v.size, v.max)
    }.toSet
    val got = SparkEntry.queries("q_int8_quant_audit")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("q_split_leakage: pair counts reconcile with the dedup pair set and leaks exist") {
    val rs = SparkEntry.queries("q_split_leakage")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getBoolean(3)))
    val nPairs = SparkEntry.queries("q_dedup_minhash")(spark, dir).count()
    assert(rs.map(_._3).sum == nPairs, "fold-pair counts must partition the pair set")
    rs.foreach { case (a, b, _, leak) =>
      assert(a <= b)
      assert(leak == (a != b))
    }
    assert(rs.exists(r => r._4 && r._3 > 0),
      "the planted copies must leak across hash folds")
  }

  test("q_dedup_cluster_profile: bands partition the dup corpus") {
    val rs = SparkEntry.queries("q_dedup_cluster_profile")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val nDocs = 2 * spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rs.map(_._3).sum == nDocs, "bands must cover every corpus doc")
    // the planted corpus has exact copies: some band beyond singletons
    assert(rs.exists(r => r._1 != "1" && r._2 > 0), "planted dupes must cluster")
    rs.foreach { case (band, nc, nd) =>
      band match {
        case "1" => assert(nd == nc)
        case "2" => assert(nd == 2 * nc)
        case "3-5" => assert(nd >= 3 * nc && nd <= 5 * nc)
        case "6+" => assert(nd >= 6 * nc)
        case other => fail(s"unexpected band $other")
      }
    }
  }

  test("q_markov_backtest equals the driver temporal-split replay") {
    val ev = eventsTable(dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val mid = (ev.map(_._3).min + ev.map(_._3).max) / 2
    val trans = ev.groupBy(_._1).values.flatMap { es =>
      es.toSeq.sortBy(e => (e._3, e._4)).sliding(2).collect {
        case Seq(a, b) => (a._2, b._2, a._3, b._3)
      }
    }.toSeq
    val pred = trans.filter(_._4 < mid).groupBy(t => (t._1, t._2))
      .view.mapValues(_.size.toLong).toSeq
      .groupBy(_._1._1).map { case (a, bs) =>
        a -> bs.map { case ((_, b), c) => (-c, b) }.min._2
      }
    val want = trans.filter(_._3 >= mid).groupBy(_._1).map { case (a, ts) =>
      val correct = ts.count(t => pred.get(a).contains(t._2)).toLong
      (a, ts.size.toLong, correct, correct * 1000000L / ts.size)
    }.toSet
    val got = SparkEntry.queries("q_markov_backtest")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("q_seasonal_naive_backtest: two models scored over the daily series") {
    val rs = SparkEntry.queries("q_seasonal_naive_backtest")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(rs.map(_._1).toSeq == Seq("naive", "seasonal_naive"))
    rs.foreach { case (_, n, mae) => assert(n > 0 && mae >= 0) }
    // the weekly lag scores fewer or equal days than the daily lag
    assert(rs(1)._2 <= rs(0)._2)
  }

  test("q_coverage_gap: day accounting is consistent per type") {
    val rs = SparkEntry.queries("q_coverage_gap")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rs.nonEmpty)
    val total = rs.head._2
    rs.foreach { case (_, n, act, gaps, ppm) =>
      assert(n == total, "all types share the global calendar")
      assert(act + gaps == n)
      assert(ppm == gaps * 1000000L / n)
    }
    // the planted every-7th-day probe type must report real gaps —
    // natural types are gap-free on this generator (r10 vacuity fix)
    val probe = rs.find(_._1 == "__probe").get
    assert(probe._4 > 0 && probe._3 > 0, "probe type reported no gaps")
  }

  test("q_embedding_drift: same-distribution halves show small component drift") {
    val rs = SparkEntry.queries("q_embedding_drift")(spark, dir)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rs.nonEmpty)
    rs.foreach { case (_, nOld, nNew, absdiff, cos) =>
      assert(nOld > 0 && nNew > 0)
      assert(cos >= -1.0 && cos <= 1.0)
      // same-distribution parity halves: per-dimension mean abs drift is
      // sampling noise (~sigma/sqrt(n)), far below the ~1e5 micro-unit
      // component magnitude a genuinely shifted batch shows. (The
      // centroid COSINE is noise for isotropic labels — range-checked
      // only.)
      assert(absdiff >= 0 && absdiff < 100000L,
        s"same-distribution drift $absdiff micro-units")
    }
  }

  test("q_perplexity_bucket: terciles partition the scored corpus in order") {
    val rs = SparkEntry.queries("q_perplexity_bucket")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(rs.map(_._1).toSeq == Seq(0, 1, 2))
    val scored = SparkEntry.queries("q_bigram_lm")(spark, dir).count()
    assert(rs.map(_._2).sum == scored, "terciles must partition the scored docs")
    assert(rs.map(_._2).max - rs.map(_._2).min <= 1, "tercile sizes balance to ±1")
    rs.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 <= b._3, "score ranges must be ordered and disjoint")
    }
    rs.foreach { case (_, _, lo, hi) => assert(lo <= hi) }
  }
}
