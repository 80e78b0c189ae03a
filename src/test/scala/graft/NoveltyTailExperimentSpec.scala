package graft

import org.apache.spark.sql.functions._

/** q_shingle_novelty, q_hill_tail, q_mutual_info, q_ab_srm,
  * q_negative_sampling on the sf0.001 fixtures. */
class NoveltyTailExperimentSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"
  private def q(key: String) = SparkEntry.queries(key)(spark, dir)

  test("shingle novelty matches a driver string-shingle replay") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), lower(col("text")).as("t"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    def shingles(t: String): Set[String] = {
      val toks = t.trim.split("\\s+").toSeq
      if (toks.length <= 3) Set(toks.mkString(" "))
      else toks.sliding(3).map(_.mkString(" ")).toSet
    }
    val sets = docs.map { case (id, t) => id -> shingles(t) }
    val df_ = sets.flatMap(_._2).groupBy(identity).view.mapValues(_.size).toMap
    val expected = sets.map { case (id, sh) =>
      val uniq = sh.count(df_(_) == 1).toLong
      (id, sh.size.toLong, uniq, uniq * 1000000L / sh.size)
    }.toSet
    val got = q("q_shingle_novelty").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected && got.nonEmpty)
  }

  test("Hill alpha matches a driver replay over the top-k order statistics") {
    val cents = eventsTable(dir)
      .select((col("value").cast("decimal(18,2)") * 100).cast("long").as("c"),
        col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter(_._1 > 0)
    val top = cents.sortBy(x => (-x._1, x._2)).take(101)
    val ck = top.map(_._1).min
    val lqs = top.filter(_._1 > ck).map { case (c, _) =>
      math.floor(math.log(c.toDouble) * 1e9).toLong -
        math.floor(math.log(ck.toDouble) * 1e9).toLong
    }
    val row = q("q_hill_tail").collect() match { case Array(r) => r }
    assert(row.getLong(0) == lqs.length, "k_used")
    assert(row.getLong(1) == ck, "threshold")
    assert(row.getLong(2) ==
      (BigInt(lqs.length) * BigInt("1000000000000000") / BigInt(lqs.sum)).toLong)
    assert(row.getLong(2) > 0, "alpha must be positive")
  }

  test("mutual information is non-negative and bounded by marginal entropy") {
    val row = q("q_mutual_info").collect() match { case Array(r) => r }
    val (n, mi) = (row.getLong(0), row.getLong(1))
    assert(n == eventsTable(dir).count())
    // MI >= 0 up to per-cell floor-quantization (|cells| ulps of 1e-9)
    assert(mi >= -100, s"MI $mi ppb should be ~non-negative")
    // MI <= ln(min(|types|, 7)) in nats
    assert(mi <= math.log(5.0) * 1e9, "MI bounded by marginal entropy")
  }

  test("A/B SRM: arms partition users; statistic matches; no SRM by design") {
    val row = q("q_ab_srm").collect() match { case Array(r) => r }
    val (n, n0, n1, stat, flag) = (row.getLong(0), row.getLong(1),
      row.getLong(2), row.getLong(3), row.getBoolean(4))
    assert(n0 + n1 == n)
    assert(n == eventsTable(dir).select("user_id").distinct().count())
    assert(stat == (n0 - n1) * (n0 - n1) * 1000000L / (n0 + n1))
    assert(flag == (stat > 3841459L))
    assert(!flag, "a uniform hash split must not trip SRM")
  }

  test("negative samples are reproducible, capped, and never purchased") {
    val got = q("q_negative_sampling").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(got.nonEmpty)
    val purchased = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_custkey") % 50 === 0)
      .join(spark.read.parquet(s"$dir/lineitem.parquet"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_partkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val np = spark.read.parquet(s"$dir/part.parquet").count()
    got.foreach { case (cust, rank, part) =>
      assert(cust % 50 == 0)
      assert(rank >= 1 && rank <= 4)
      // candidates must land in the REAL partkey domain (1..np): part 0
      // doesn't exist and would silently dodge the purchased anti-join
      assert(part >= 1 && part <= np, s"part_key $part outside 1..$np")
      assert(!purchased.contains((cust, part)),
        s"customer $cust sampled an actually-purchased part $part")
    }
    got.groupBy(_._1).foreach { case (c, xs) =>
      assert(xs.map(_._2).sorted.toSeq == (1 to xs.length).toSeq,
        s"customer $c ranks not dense")
    }
    // determinism: a second run yields the identical sample
    val again = q("q_negative_sampling").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(got.toSet == again.toSet)
  }
}
