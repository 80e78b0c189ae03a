package graft

import org.apache.spark.sql.functions._

/** q_canonical_pick, q_rolling_quantile on the sf0.001 fixtures. */
class CanonicalRollingSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"
  private def q(key: String) = SparkEntry.queries(key)(spark, dir)

  test("canonicalization keeps exactly one doc per cluster and originals beat copies") {
    val out = q("q_canonical_pick").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val n = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(out.length == 2 * n, "one verdict per corpus row (originals + planted copies)")
    // every doc maps to a canonical that is itself kept
    val keptIds = out.collect { case (id, _, true) => id }.toSet
    assert(out.forall { case (_, canon, _) => keptIds(canon) },
      "canonical targets must themselves be kept")
    out.groupBy(_._2).foreach { case (canon, members) =>
      assert(members.count(_._3) == 1, s"cluster $canon must keep exactly one")
    }
    // exact copies tie on quality → the lower-id ORIGINAL wins
    assert(out.filter(_._1 >= 1000000L).forall(!_._3),
      "planted copies must never be canonical")
  }

  test("rolling median matches a driver-side frame walk") {
    val ev = eventsTable(dir)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val expected = ev.groupBy(_._2).values.flatMap { g =>
      val ordered = g.sortBy(e => (e._3, e._1))
      ordered.zipWithIndex.map { case ((id, _, _, _), i) =>
        val frame = ordered.slice(math.max(0, i - 24), i + 1).map(_._4).sorted
        val m = frame.length
        val lo = frame((m + 1) / 2 - 1)
        val hi = frame(m / 2)
        id -> BigDecimal(lo + (hi - lo) * 0.5)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }.toMap
    val got = q("q_rolling_quantile").collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got == expected,
      s"median diverges at ${got.keys.find(k => got(k) != expected(k))}")
  }
}
