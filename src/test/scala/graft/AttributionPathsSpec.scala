package graft

import org.apache.spark.sql.functions._

/** q_attribution, q_interarrival, q_session_paths on the sf0.001 fixtures. */
class AttributionPathsSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"
  private def q(key: String) = SparkEntry.queries(key)(spark, dir)

  private def events = {
    eventsTable(dir)
  }

  test("attribution partitions purchases; channels are touch types or direct") {
    val rows = q("q_attribution").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val purchases = events.filter(col("event_type") === "purchase").count()
    assert(rows.map(_._2).sum == purchases,
      "every purchase lands in exactly one channel")
    val cents = events.filter(col("event_type") === "purchase")
      .agg(sum((col("value").cast("decimal(18,2)") * 100).cast("long")))
      .first().getLong(0)
    assert(rows.map(_._3).sum == cents, "revenue cents partition exactly")
    assert(rows.map(_._1).toSet.subsetOf(Set("view", "click", "direct")))
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-4, "shares sum to ~1")
  }

  test("attribution matches a driver-side last-touch replay") {
    val ev = events.select("user_id", "ts", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime * 1000 +
        r.getTimestamp(1).getNanos / 1000 % 1000, r.getString(2)))
    val byUser = ev.groupBy(_._1)
    val expected = ev.filter(_._3 == "purchase").map { case (u, t, _) =>
      byUser(u).filter(e => (e._3 == "view" || e._3 == "click") &&
          e._2 <= t && e._2 >= t - 604800000000L)
        .sortBy(_._2).lastOption.map(_._3).getOrElse("direct")
    }.groupBy(identity).map { case (ch, xs) => ch -> xs.length.toLong }
    val got = q("q_attribution").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected, s"$got != $expected")
  }

  test("interarrival percentiles bound the gap distribution") {
    val rows = q("q_interarrival").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val types = events.select("event_type").distinct().count()
    assert(rows.length == types)
    rows.foreach { case (t, n, p50, p95) =>
      assert(n > 0, s"$t has gaps")
      assert(p50 > 0 && p95 >= p50, s"$t p50 $p50 p95 $p95")
    }
    // driver replay for one type: exact interpolated percentiles
    val (t0, n0, p50g, _) = rows.sortBy(_._1).head
    val gaps = events.filter(col("event_type") === t0)
      .select("user_id", "ts", "event_id").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime * 1000 +
        r.getTimestamp(1).getNanos / 1000 % 1000, r.getLong(2)))
      .groupBy(_._1).values.flatMap { es =>
        es.sortBy(e => (e._2, e._3)).sliding(2).collect {
          case Array(a, b) => (b._2 - a._2).toDouble
        }
      }.toArray.sorted
    assert(gaps.length == n0, s"$t0 gap count")
    val pos = 0.5 * (gaps.length - 1)
    val (lo, hi) = (gaps(pos.toInt), gaps(math.ceil(pos).toInt))
    val frac = pos - math.floor(pos)
    val want = BigDecimal(((1 - frac) * lo + frac * hi) / 1e6)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(p50g - want) < 1e-9, s"$t0 p50 $p50g != $want")
  }

  test("session paths: ≤20 rows, ≤5 steps, counts cover all sessions") {
    val rows = q("q_session_paths").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.length <= 20 && rows.nonEmpty)
    rows.foreach { case (path, n) =>
      assert(n >= 1)
      val steps = path.split(">")
      assert(steps.length <= 5 && steps.forall(_.nonEmpty), s"bad path $path")
    }
    // counts are sorted desc with path tie-break
    rows.sliding(2).filter(_.length == 2).foreach { case Array(a, b) =>
      assert(a._2 > b._2 || (a._2 == b._2 && a._1 < b._1), "top-20 order")
    }
    val sessions = SparkEntry.queries("q_sessionize")(spark, dir)
      .select("user_id", "session_id").distinct().count()
    assert(rows.map(_._2).sum <= sessions,
      "top-20 path counts cannot exceed the session count")
  }
}
