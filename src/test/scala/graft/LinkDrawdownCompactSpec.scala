package graft

import org.apache.spark.sql.functions._

/** q_link_predict, q_drawdown, q_compaction_plan: exact driver replays
  * on sf0.001 plus structural identities (predicted pairs are never
  * edges; drawdown ≥ 0 and peak is monotone; bins partition the file
  * set exactly and bin ids are consecutive). */
class LinkDrawdownCompactSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"
  private def q(key: String) = SparkEntry.queries(key)(spark, dir)

  /** Co-purchase edge set (ea < eb, co-bought in ≥2 orders). */
  private def edgeSet(): Set[(Long, Long)] = {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey").cast("long"), col("l_partkey").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    li.groupBy(_._1).values.toSeq
      .flatMap { xs =>
        val ps = xs.map(_._2).distinct.sorted
        for (i <- ps.indices; j <- (i + 1) until ps.length)
          yield (ps(i), ps(j))
      }
      .groupBy(identity).filter(_._2.length >= 2).keySet
  }

  test("link prediction matches a driver replay; pairs are non-edges") {
    val edges = edgeSet()
    val adj = edges.toSeq.flatMap(e => Seq((e._1, e._2), (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expected = (for {
      (n, vs) <- adj.toSeq
      a <- vs; b <- vs if a < b
    } yield (a, b))
      .groupBy(identity).view.mapValues(_.length.toLong)
      .filter { case (p, cn) => cn >= 2 && !edges(p) }
      .map { case ((a, b), cn) => (a, b, cn) }.toSet
    val got = q("q_link_predict").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected && got.nonEmpty)
    got.foreach { case (a, b, cn) =>
      assert(a < b && cn >= 2 && !edges((a, b)))
    }
  }

  test("drawdown matches a driver replay; peak monotone, dd >= 0") {
    val daily = spark.read.parquet(s"$dir/orders.parquet")
      .select(date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    var peak = Long.MinValue
    val expected = daily.toSeq.sortBy(_._1).map { case (day, rev) =>
      peak = math.max(peak, rev)
      (day, rev, peak, peak - rev)
    }.toSet
    val got = q("q_drawdown").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected && got.nonEmpty)
    got.foreach { case (d, _, p, dd) =>
      assert(dd >= 0, s"$d: negative drawdown")
      assert(p >= daily(d), s"$d: peak below the day's own revenue")
    }
  }

  test("compaction plan matches a driver replay; bins account for all") {
    val target = 8192L
    val chunks = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey").cast("long")).collect()
      .map(r => r.getLong(0) / 512)
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .sortBy(_._1)
    var cum = 0L
    val expected = chunks.map { case (c, n) =>
      cum += n; (c, n, (cum - 1) / target)
    }.groupBy(_._3).map { case (bin, xs) =>
      (bin, xs.length.toLong, xs.map(_._2).sum)
    }.toSet
    val got = q("q_compaction_plan").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected && got.nonEmpty)
    assert(got.toSeq.map(_._2).sum == chunks.length
      && got.toSeq.map(_._3).sum == chunks.map(_._2).sum,
      "bins must partition files and rows exactly")
    // cumulative-end rule: bin ids are the consecutive range 0..last
    val ids = got.toSeq.map(_._1).sorted
    assert(ids == (0L until ids.length).toSeq,
      s"bin ids not consecutive from 0: $ids")
  }
}
