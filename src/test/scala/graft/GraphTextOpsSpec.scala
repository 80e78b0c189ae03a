package graft

import org.apache.spark.sql.functions._

/** Ops 288-293 (round-8 widening, graph + text + paired stats):
  * modularity, bipartite projection, degree distribution, readability,
  * per-source char KL, Wilcoxon signed-rank — driver replays at
  * sf0.001 with plain Scala collections (the CorpusBuildSpec
  * discipline). The graph replays rebuild the co-purchase edge set
  * brute-force from lineitem, independently of copurchaseEdges. */
class GraphTextOpsSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"

  /** Brute-force co-purchase edges: same-order part pairs in >= 2 orders. */
  private lazy val edges: Set[(Long, Long)] = {
    val baskets = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
      .groupBy(_._1).values.map(_.map(_._2).toSet)
    baskets.toSeq.flatMap { ps =>
      val v = ps.toSeq.sorted
      for (i <- v.indices; j <- (i + 1) until v.size) yield (v(i), v(j))
    // NB: Map.collect returning pairs would REBUILD A MAP and dedupe
    // edges by first endpoint — filter + keySet keeps every edge
    }.groupBy(identity).filter(_._2.size >= 2).keySet
  }

  private lazy val degree: Map[Long, Long] =
    edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("q_modularity: per-brand contributions sum to Newman's Q") {
    val brand = spark.read.parquet(s"$dir/part.parquet")
      .select(col("p_partkey"), col("p_brand"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val m = edges.size.toLong
    val dc = degree.toSeq.groupBy(d => brand(d._1))
      .view.mapValues(vs => (vs.size.toLong, vs.map(_._2).sum)).toMap
    val ec = edges.toSeq.filter(e => brand(e._1) == brand(e._2))
      .groupBy(e => brand(e._1)).view.mapValues(_.size.toLong).toMap
    def signPpm(num: BigInt, den: BigInt): Long =
      if (num >= 0) (num * 1000000 / den).toLong
      else -((-num * 1000000 / den).toLong)
    val want = dc.map { case (b, (nv, ds)) =>
      val e = ec.getOrElse(b, 0L)
      (b, nv, e, ds,
        signPpm(BigInt(4) * m * e - BigInt(ds) * ds, BigInt(4) * m * m))
    }.toSet
    val got = SparkEntry.queries("q_modularity")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == want)
    // Q in [-1, 1] and the ppm contributions sum close to a real Q
    val q = got.toSeq.map(_._5).sum / 1e6
    assert(q >= -1.0 && q <= 1.0)
  }

  test("q_bipartite_project: top-20 supplier pairs replay exactly") {
    val sp = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_partkey"), col("l_suppkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val full = sp.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val pairs = sp.groupBy(_._1).values
      .map(_.map(_._2).toSeq.sorted).filter(_.size <= 64)
      .flatMap(v => for (i <- v.indices; j <- (i + 1) until v.size)
        yield (v(i), v(j)))
      .groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= 3).toSeq
    val want = pairs.map { case ((a, b), n) =>
      (a, b, n, full(a), full(b), n * 1000000L / (full(a) + full(b) - n))
    }.sortBy(t => (-t._3, t._1, t._2)).take(20)
    val got = SparkEntry.queries("q_bipartite_project")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == want)
  }

  test("q_degree_dist: histogram and CCDF replay; CCDF ends at 1e6") {
    val hist = degree.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val tot = degree.size.toLong
    val want = hist.map { case (d, nv) =>
      val cum = hist.filter(_._1 >= d).values.sum
      (d, nv, cum * 1000000L / tot)
    }.toSet
    val got = SparkEntry.queries("q_degree_dist")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    assert(got.exists(_._3 == 1000000L), "min degree row must have CCDF 1")
  }

  test("q_readability: regex counts and the F-K fold replay per doc") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val want = docs.map { case (id, text) =>
      val lo = text.toLowerCase
      val w = "[a-z0-9]+".r.findAllIn(lo).size.toLong
      val sRaw = "[.!?]+".r.findAllIn(text).size.toLong
      val sN = math.max(1L, sRaw)
      val y = "[aeiouy]+".r.findAllIn(lo).size.toLong
      val grade = if (w > 0)
        math.rint((0.39 * (w.toDouble / sN) + 11.8 * (y.toDouble / w)
          - 15.59) * 1e6) / 1e6
      else 0.0
      (id, w, sN, y, grade)
    }.toSet
    val got = SparkEntry.queries("q_readability")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet
    // rint vs HALF_UP can differ at exact .5 boundaries — compare with a
    // tolerance on the grade, exactly on the counts
    assert(got.map(t => (t._1, t._2, t._3, t._4)) ==
      want.map(t => (t._1, t._2, t._3, t._4)))
    val wantByid = want.map(t => t._1 -> t._5).toMap
    got.foreach { case (id, _, _, _, g) =>
      assert(math.abs(g - wantByid(id)) < 2e-6, s"doc $id grade")
    }
  }

  test("q_char_kl: exact integer KL fold, nonnegative, self-KL zero") {
    val got = SparkEntry.queries("q_char_kl")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), Seq(r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)), r.getLong(7),
        r.getDouble(8)))
    assert(got.nonEmpty)
    got.foreach { case (src, n, cs, klq, kl) =>
      assert(cs.forall(_ >= 0) && cs.sum == n, s"$src class partition")
      assert(math.abs(kl - klq / 1e12) < 1e-6)
      // quantized-log KL of near-identical dists can dip a hair below 0;
      // a real divergence must not be strongly negative
      assert(klq > -5L * 1000000L, s"$src kl_q12 $klq")
    }
    // replay one source's fold exactly
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("source"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    def counts(texts: Seq[String]): (Long, Seq[Long]) = {
      val all = texts.map(_.toLowerCase)
      val n = texts.map(_.length.toLong).sum
      val c1 = all.map(t => t.count("aeiou".contains(_)).toLong).sum
      val c2 = all.map(t => t.count(c => c >= 'a' && c <= 'z'
        && !"aeiou".contains(c)).toLong).sum
      val c3 = all.map(t => t.count(_.isDigit).toLong).sum
      val c4 = all.map(t => "\\s".r.findAllIn(t).size.toLong).sum
      (n, Seq(c1, c2, c3, c4, n - c1 - c2 - c3 - c4))
    }
    val bySrc = docs.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val (tn, tcs) = counts(docs.map(_._2).toSeq)
    val src0 = bySrc.keys.min
    val (n0, cs0) = counts(bySrc(src0))
    def lnq6(x: Long): Long = math.floor(math.log(x.toDouble) * 1e6).toLong
    val wantKl = (0 until 5).map { i =>
      val p = math.max(1L, (cs0(i) + 1) * 1000000L / (n0 + 5))
      val q = math.max(1L, (tcs(i) + 1) * 1000000L / (tn + 5))
      p * (lnq6(p) - lnq6(q))
    }.sum
    val gotRow = got.find(_._1 == src0).get
    assert(gotRow._2 == n0 && gotRow._3 == cs0)
    assert(gotRow._4 == wantKl, s"kl_q12 ${gotRow._4} vs $wantKl")
  }

  test("q_wilcoxon: W+, ties and z replay from brute-force avg ranks") {
    val daily = spark.read.parquet(s"$dir/orders.parquet")
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
        .as("x"))
      .collect().map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getLong(1)))
      .toMap
    val diffs = daily.toSeq.flatMap { case (d, x) =>
      daily.get(d + 364).map(_ - x)
    }.filter(_ != 0L)
    val n = diffs.size.toLong
    val byAbs = diffs.groupBy(d => math.abs(d))
    val sortedAbs = byAbs.keys.toSeq.sorted
    var seen = 0L
    var w2 = 0L
    var ties = 0L
    sortedAbs.foreach { a =>
      val t = byAbs(a).size.toLong
      val pos = byAbs(a).count(_ > 0).toLong
      w2 += pos * (2 * seen + t + 1)
      ties += t * t * t - t
      seen += t
    }
    val z = (w2 / 2.0 - n * (n + 1) / 4.0) /
      math.sqrt(n * (n + 1) * (2 * n + 1) / 24.0 - ties / 48.0)
    val got = SparkEntry.queries("q_wilcoxon")(spark, dir).collect().head
    assert(got.getLong(0) == n)
    assert(got.getLong(1) == w2)
    assert(math.abs(got.getDouble(2) - z) < 5e-7)
  }
}
