package graft

import org.apache.spark.sql.functions._

/** Ops 333-336 (round-8 widening, normalization + growth-law corpus
  * ops): quantile normalization, audience overlap, elasticity, Heaps'
  * law — driver replays at sf0.001. */
class NormalizationGrowthOpsSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"

  test("q_quantile_normalize: decile map replays against quantile_cont") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("source"), length(col("text")).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // the exact weighted form (ceil-pos)·lo + (pos-floor)·hi — Spark
    // percentile's (and DistributedPercentiles') interpolation; the
    // lo + f·(hi-lo) form differs by an ulp at integer boundaries
    def qcont(xs: Seq[Long], p: Double): Long = {
      val sorted = xs.sorted
      val h = p * (sorted.size - 1)
      val f = h - h.toInt
      val lo = sorted(h.toInt)
      val hi = sorted(math.min(h.toInt + 1, sorted.size - 1))
      math.floor((1.0 - f) * lo + f * hi).toLong
    }
    val all = docs.map(_._2).toSeq
    val want = docs.groupBy(_._1).flatMap { case (src, ds) =>
      (1 to 9).map { i =>
        val sl = qcont(ds.map(_._2).toSeq, i / 10.0)
        val cl = qcont(all, i / 10.0)
        (src, i, sl, cl, cl - sl)
      }
    }.toSet
    val got = SparkEntry.queries("q_quantile_normalize")(spark, dir)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == want)
    // the map covers every (source, decile) cell
    assert(got.size == docs.map(_._1).distinct.size * 9)
  }

  test("q_audience_overlap: set algebra replays; ppm identities hold") {
    // purchaser audiences: any-event audiences are identical every week
    // on this fixture (jaccard pinned at 1e6 — a vacuous overlap)
    val wu = eventsTable(dir)
      .filter(col("event_type") === "purchase")
      .select(expr("unix_micros(ts) div 604800000000"), col("user_id"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val byWk = wu.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val weeks = byWk.keys.toSeq.sorted
    val want = weeks.zip(weeks.tail).filter(p => p._2 == p._1 + 1)
      .map { case (a, b) =>
        val sa = byWk(a); val sb = byWk(b)
        val c = (sa intersect sb).size.toLong
        (a, b, sa.size.toLong, sb.size.toLong, c,
          c * 1000000 / (sa.size + sb.size - c),
          c * 1000000 / sa.size,
          (sb.size - c) * 1000000 / sb.size)
      }.toSet
    val got = SparkEntry.queries("q_audience_overlap")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSet
    assert(got == want)
    got.foreach { case (_, _, na, nb, c, j, ret, nw) =>
      assert(c <= math.min(na, nb) && j <= 1000000)
      assert(ret <= 1000000 && nw <= 1000000)
    }
  }

  test("q_elasticity: log-log moments replay in fixed point") {
    val byPart = spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_partkey")
      .agg(sum(col("l_quantity").cast("long")).as("q"))
      .join(spark.read.parquet(s"$dir/part.parquet"),
        col("l_partkey") === col("p_partkey"))
      .select((col("p_retailprice").cast("decimal(18,2)") * 100).cast("long"),
        col("q"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def ln6(v: Long): Long = math.floor(math.log(v.toDouble) * 1e6).toLong
    val pts = byPart.map { case (p, q) => (ln6(p), ln6(q)) }
    val n = pts.length.toLong
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(t => BigInt(t._1) * t._2).sum
    val sxx = pts.map(t => BigInt(t._1) * t._1).sum
    val num = BigInt(n) * sxy - BigInt(sx) * sy
    val den = BigInt(n) * sxx - BigInt(sx) * sx
    val beta =
      (if (num >= 0) num * 1000000 / den else -((-num) * 1000000 / den)).toLong
    val r = SparkEntry.queries("q_elasticity")(spark, dir).collect()(0)
    assert(r.getLong(0) == n)
    assert(r.getLong(1) == beta)
    // synthetic price and demand are independent: |corr| near zero
    assert(math.abs(r.getDouble(2)) < 0.2)
  }

  test("q_heaps_law: cumulative vocab replays; beta is the 10-point slope") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .sortBy(_._1)
    val toks = docs.map { case (id, t) =>
      (id, t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq)
    }
    val ids = toks.map(_._1.toDouble)
    def qcont(p: Double): Long = {
      val h = p * (ids.size - 1)
      val f = h - h.toInt
      val lo = ids(h.toInt)
      val hi = ids(math.min(h.toInt + 1, ids.size - 1))
      math.floor((1.0 - f) * lo + f * hi).toLong
    }
    val cuts = (1 to 10).map(i => (i, qcont(i / 10.0)))
    // trigram types: the 31-word unigram vocab saturates in the first
    // decile and pinned beta to 0 — a vacuous growth measure
    val firstOcc = scala.collection.mutable.Map.empty[String, Long]
    toks.foreach { case (id, ws) =>
      ws.sliding(3).filter(_.size == 3).map(_.mkString(" ")).foreach { w =>
        if (!firstOcc.contains(w)) firstOcc(w) = id
        else if (firstOcc(w) > id) firstOcc(w) = id
      }
    }
    def ln6(v: Long): Long = math.floor(math.log(v.toDouble) * 1e6).toLong
    val pts = cuts.map { case (k, cut) =>
      val in = toks.filter(_._1 <= cut)
      val nt = in.map(_._2.size.toLong).sum
      val v = firstOcc.values.count(_ <= cut).toLong
      (k, cut, in.size.toLong, nt, v)
    }
    val xs = pts.map(p => (ln6(p._4), ln6(p._5)))
    val n = xs.size.toLong
    val sx = xs.map(_._1).sum; val sy = xs.map(_._2).sum
    val sxy = xs.map(t => BigInt(t._1) * t._2).sum
    val sxx = xs.map(t => BigInt(t._1) * t._1).sum
    val num = BigInt(n) * sxy - BigInt(sx) * sy
    val den = BigInt(n) * sxx - BigInt(sx) * sx
    val beta =
      (if (num >= 0) num * 1000000 / den else -((-num) * 1000000 / den)).toLong
    val got = SparkEntry.queries("q_heaps_law")(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).sortBy(_._1)
    assert(got.map(t => (t._1, t._2, t._3, t._4, t._5)).toSeq == pts)
    assert(got.forall(_._6 == beta))
    // trigram types keep growing with the corpus — the slope must be
    // clearly positive (a saturated/template vocabulary would read ~0,
    // which is exactly the degenerate state the measure exists to flag)
    assert(beta > 500000, s"beta $beta")
  }
}
