package graft

import org.apache.spark.sql.functions._

/** q_kcore, q_throttle, q_source_jaccard: exact driver replays on
  * sf0.001 plus structural identities (peel counts monotone; kept +
  * suppressed = total events; Jaccard symmetric-bounded). */
class KcoreThrottleJaccardSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"
  private def q(key: String) = SparkEntry.queries(key)(spark, dir)

  test("kcore matches a driver peel replay; counts shrink monotonically") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey").cast("long"), col("l_partkey").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    var edges = li.groupBy(_._1).values.toSeq
      .flatMap { xs =>
        val ps = xs.map(_._2).distinct.sorted
        for (i <- ps.indices; j <- (i + 1) until ps.length)
          yield (ps(i), ps(j))
      }
      // NB: .collect { case (e, g) ... => e } on a Map would rebuild a
      // Map (e is a pair!) and collapse edges by their first endpoint —
      // filter + keySet keeps the full edge set.
      .groupBy(identity).filter(_._2.length >= 2).keySet
    val expected = (1 to 6).map { r =>
      val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).view.mapValues(_.length).toMap
      val keep = deg.collect { case (v, d) if d >= 3 => v }.toSet
      edges = edges.filter(e => keep(e._1) && keep(e._2))
      (r.toLong, keep.size.toLong, edges.size.toLong)
    }
    val got = q("q_kcore").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(got == expected && got.nonEmpty)
    got.sliding(2).foreach {
      case Seq((_, n1, e1), (_, n2, e2)) =>
        assert(n2 <= n1 && e2 <= e1, "peel must shrink monotonically")
      case _ =>
    }
  }

  test("throttle matches a driver replay; kept + suppressed = total") {
    val rows = eventsTable(dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tus"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = rows.groupBy(x => (x._1, x._3 / 600000000L))
      .map { case ((u, w), xs) =>
        val first = xs.minBy(x => (x._3, x._2))
        (u, w * 600000000000L, first._2, xs.length - 1L)
      }.toSet
    val got = q("q_throttle").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected && got.nonEmpty)
    assert(got.size + got.toSeq.map(_._4).sum == rows.length,
      "kept windows + suppressed events must account for every event")
  }

  test("source jaccard matches a driver replay; ppm bounded by 1e6") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("source"), lower(col("text")).as("t"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val vocab = docs.groupBy(_._1).view.mapValues(
      _.flatMap(_._2.trim.split("\\s+")).toSet).toMap
    val expected = (for {
      a <- vocab.keys; b <- vocab.keys if a < b
      common = (vocab(a) & vocab(b)).size if common > 0
    } yield {
      val (na, nb) = (vocab(a).size.toLong, vocab(b).size.toLong)
      (a, b, na, nb, common.toLong,
        (BigInt(common) * 1000000 / (na + nb - common)).toLong)
    }).toSet
    val got = q("q_source_jaccard").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == expected && got.nonEmpty)
    got.foreach { case (a, b, _, _, _, ppm) =>
      assert(ppm >= 0 && ppm <= 1000000L, s"($a,$b): ppm=$ppm out of range")
    }
  }
}
