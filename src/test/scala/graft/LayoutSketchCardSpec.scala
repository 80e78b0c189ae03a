package graft

import org.apache.spark.sql.functions._

/** q_streaks, q_hist2d, q_data_card, q_zonemap_prune, q_kmv_distinct on
  * the sf0.001 fixtures. */
class LayoutSketchCardSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"
  private def q(key: String) = SparkEntry.queries(key)(spark, dir)

  test("streaks match a driver-side per-user run-length replay") {
    val ev = eventsTable(dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val runs = ev.groupBy(_._1).values.flatMap { g =>
      val ordered = g.sortBy(e => (e._3, e._2)).map(_._4)
      // collapse consecutive equal types into (type, len) runs
      ordered.foldLeft(List.empty[(String, Long)]) {
        case ((t, n) :: rest, x) if t == x => (t, n + 1) :: rest
        case (acc, x) => (x, 1L) :: acc
      }
    }.toSeq
    val expected = runs.groupBy(_._1).map { case (t, xs) =>
      (t, xs.length.toLong, xs.map(_._2).max, xs.map(_._2).sum)
    }.toSet
    val got = q("q_streaks").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected && got.nonEmpty)
    assert(got.toSeq.map(_._4).sum == ev.length,
      "per-type streak events must partition the corpus")
  }

  test("hist2d cells partition the events; bins match an exact replay") {
    val ev = eventsTable(dir)
      .select(unix_micros(col("ts")).as("us"), col("value"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val expected = ev.groupBy { case (us, v) =>
      val dow = ((us / 86400000000L + 3) % 7 + 1).toInt
      val band = math.min(math.max(math.floor(v / 50.0), 0.0), 9.0).toInt
      (dow, band)
    }.map { case (k, xs) =>
      (k._1, k._2, xs.length.toLong,
        xs.map(x => BigDecimal(x._2).setScale(2, BigDecimal.RoundingMode.HALF_UP)
          .*(100).toLongExact).sum)
    }.toSet
    val got = q("q_hist2d").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected && got.nonEmpty)
    assert(got.toSeq.map(_._3).sum == ev.length, "cells partition the corpus")
    got.foreach { case (dow, band, _, _) =>
      assert(dow >= 1 && dow <= 7 && band >= 0 && band <= 9)
    }
  }

  test("data card matches a driver replay; dominant language is the argmax") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("source"), col("lang"), col("n_chars"),
        lower(col("text")).as("t"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getString(3).trim.split("\\s+").length.toLong))
    val expected = docs.groupBy(_._1).map { case (src, xs) =>
      val byLang = xs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val (topLang, topN) = byLang.toSeq.minBy { case (l, n) => (-n, l) }
      (src, xs.length.toLong, byLang.size.toLong, xs.map(_._3).sum,
        xs.map(_._4).sum, topLang, topN * 1000000L / xs.length,
        xs.map(_._3).sum / xs.length)
    }.toSet
    val got = q("q_data_card").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5), r.getLong(6), r.getLong(7))).toSet
    assert(got == expected && got.nonEmpty)
  }

  test("zonemap audit: layouts compare; sorted layout prunes, arrival doesn't") {
    val rows = q("q_zonemap_prune").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("arrival", "ship_month"))
    val exact = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_shipdate").cast("timestamp") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate").cast("timestamp") < lit("1995-07-01").cast("timestamp"))
      .count()
    val total = spark.read.parquet(s"$dir/lineitem.parquet").count()
    rows.foreach { case (layout, r) =>
      val (nChunks, nSkipped, rowsTotal, rowsScanned, rowsMatched, ppm) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))
      assert(nSkipped <= nChunks && rowsScanned <= rowsTotal)
      assert(rowsMatched <= rowsScanned,
        s"$layout: matches can only live in scanned (non-skipped) chunks")
      assert(ppm == nSkipped * 1000000L / nChunks)
      // layout changes WHICH chunks skip, never the answer
      assert(rowsMatched == exact, s"$layout: rows_matched $rowsMatched != direct $exact")
      assert(rowsTotal == total)
    }
    // the contrast IS the operator's point: chunking by arrival order
    // interleaves ship dates (every zone straddles the predicate → ~0
    // skipped), while chunking by ship month makes zones tight and
    // skips every out-of-range month
    val arrival = rows("arrival")
    val sorted = rows("ship_month")
    assert(sorted.getLong(2) > arrival.getLong(2),
      "ship_month layout must skip strictly more chunks than arrival")
    assert(sorted.getLong(6) >= 500000L,
      "ship_month layout should prune most chunks (6 months of ~84)")
    assert(sorted.getLong(4) < arrival.getLong(4),
      "ship_month layout must scan fewer rows than arrival")
  }

  test("KMV estimate brackets the exact distinct within sketch error") {
    val row = q("q_kmv_distinct").collect() match { case Array(r) => r }
    val (kUsed, kth, exact, est, errPpm) = (row.getLong(0), row.getLong(1),
      row.getLong(2), row.getLong(3), row.getLong(4))
    assert(kUsed <= 256 && kth > 0)
    assert(exact > 0 && est > 0)
    if (kUsed < 256) assert(est == kUsed, "under-filled sketch is exact")
    // k=256 → relative σ ≈ 1/√(k−2) ≈ 6.3%; 5σ bound keeps this
    // deterministic-in-practice while still meaningful
    assert(errPpm <= 320000, s"KMV err $errPpm ppm > 32%")
    assert(errPpm == math.abs(est - exact) * 1000000L / exact)
  }
}
