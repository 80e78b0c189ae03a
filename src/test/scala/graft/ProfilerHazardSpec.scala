package graft

import org.apache.spark.sql.functions._

/** q_tokenizer_fertility, q_prefix_autocomplete, q_churn_hazard,
  * q_fd_audit, q_event_downsample on the sf0.001 fixtures. */
class ProfilerHazardSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"
  private def q(key: String) = SparkEntry.queries(key)(spark, dir)

  test("fertility matches a driver replay; ratio >= 1 (BPE never merges words)") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("lang"), lower(col("text")).as("t"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val bpeRe = "[a-z]+|[0-9]+|[^a-z0-9\\s]".r
    val expected = docs.groupBy(_._1).map { case (lang, xs) =>
      val words = xs.map(_._2.trim.split("\\s+").length.toLong).sum
      val toks = xs.map(x => bpeRe.findAllIn(x._2).length.toLong).sum
      (lang, xs.length.toLong, words, toks, toks * 1000000L / words)
    }.toSet
    val got = q("q_tokenizer_fertility").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected && got.nonEmpty)
    got.foreach { case (lang, _, w, t, f) =>
      assert(t >= w && f >= 1000000L,
        s"$lang: BPE pre-tokens can only split whitespace words")
    }
  }

  test("autocomplete: per-prefix top-3 by count with asc-token tie-break") {
    val counts = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("t"))
      .filter(length(col("t")) >= 3)
      .groupBy("t").count().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val expected = counts.groupBy(_._1.take(3)).toSeq.flatMap { case (p, xs) =>
      xs.sortBy(x => (-x._2, x._1)).take(3).zipWithIndex
        .map { case ((tok, c), i) => (p, i + 1, tok, c) }
    }.toSet
    val got = q("q_prefix_autocomplete").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3)))
      .toSet
    assert(got == expected && got.nonEmpty)
  }

  test("churn hazard: churned users partition; censored only at the last week") {
    val rows = q("q_churn_hazard").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    val users = eventsTable(dir).select("user_id").distinct().count()
    // every user churns in exactly one week (their last)
    assert(rows.map(_._3).sum == users,
      "last-week counts must partition the user set")
    val censored = rows.filter(_._5)
    assert(censored.length == 1 && censored.head._1 == rows.map(_._1).max,
      "exactly the max week is censored")
    rows.foreach { case (wk, active, churned, hazard, _) =>
      assert(churned <= active, s"$wk churned exceeds active")
      assert(hazard == churned * 1000000L / active, s"$wk hazard")
    }
  }

  test("FD audit: key FDs hold, non-key FDs fail, with exact counts") {
    val byFd = q("q_fd_audit").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))).toMap
    assert(byFd("customer: c_custkey -> c_name")._4, "PK FD must hold")
    assert(byFd("nation: n_nationkey -> n_regionkey")._4, "PK FD must hold")
    assert(!byFd("orders: o_custkey -> o_orderstatus")._4,
      "customers order in several statuses")
    assert(!byFd("lineitem: l_orderkey -> l_suppkey")._4,
      "orders span suppliers")
    val orderKeys = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_custkey").distinct().count()
    assert(byFd("orders: o_custkey -> o_orderstatus")._1 == orderKeys)
  }

  test("downsample keeps every 4th event per user; replay agrees per type") {
    val ev = eventsTable(dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    val expected = ev.groupBy(_._1).values.flatMap { g =>
      g.sortBy(e => (e._3, e._2)).zipWithIndex
        .collect { case (e, i) if i % 4 == 0 => e._4 }
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = q("q_event_downsample").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._2).sum == ev.length)
    got.foreach { case (t, total, kept, ppm) =>
      assert(kept == expected(t), s"$t kept")
      assert(ppm == kept * 1000000L / total)
    }
    // the 1-in-4 rule is per USER, so only the global rate is bounded:
    // each user keeps ceil(n/4) of their n events
    assert(got.map(_._3).sum >= ev.length / 4, "globally under-sampled")
  }
}
