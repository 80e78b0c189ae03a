package graft

import org.apache.spark.sql.functions._

/** q_bpe_train, q_simpson, q_mom_growth: exact driver replays on
  * sf0.001 (the BPE replay reimplements the two-pass-replace loop
  * independently on collected word frequencies). */
class BpeSimpsonGrowthSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"
  private def q(key: String) = SparkEntry.queries(key)(spark, dir)

  test("BPE merge table matches an independent driver replay") {
    var words: Map[String, Long] = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
      .collect().map(_.getString(0)).filter(_.length >= 2)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
      .map { case (w, f) => (" " + w.toCharArray.mkString("", " ", " "), f) }
    val expected = (1 to 5).map { i =>
      val counts = collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (rep, f) =>
        val syms = rep.split(" ").filter(_.nonEmpty)
        syms.sliding(2).foreach {
          case Array(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _ =>
        }
      }
      val ((a, b), cnt) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
      val (pat, sub) = (s" $a $b ", s" $a$b ")
      words = words.groupBy { case (rep, _) =>
        rep.replace(pat, sub).replace(pat, sub)
      }.view.mapValues(_.values.sum).toMap
      (i, a, b, cnt)
    }
    val got = q("q_bpe_train").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(got == expected)
    assert(got.map(_._4).forall(_ > 0))
  }

  test("Simpson concentration matches an exact driver replay") {
    val counts = spark.read.parquet(s"$dir/documents.parquet")
      .groupBy("lang", "source").count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val expected = counts.groupBy(_._1).collect {
      case (lang, xs) if xs.map(_._3).sum > 1 =>
        val n = xs.map(_._3).sum
        val num = xs.map(x => BigInt(x._3) * (x._3 - 1)).sum * 1000000
        (lang, n, xs.length.toLong, (num / (BigInt(n) * (n - 1))).toLong)
    }.toSet
    val got = q("q_simpson").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected && got.nonEmpty)
  }

  test("MoM growth matches an exact driver replay, first month NULL") {
    val months = spark.read.parquet(s"$dir/orders.parquet")
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("m"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    val expected = months.zipWithIndex.map { case ((m, c), i) =>
      if (i == 0) (m, c, None: Option[Long], None: Option[Long])
      else {
        val prev = months(i - 1)._2
        (m, c, Some(prev),
          Some(((BigInt(c) - prev) * 1000000 / prev).toLong))
      }
    }.toSet
    val got = q("q_mom_growth").collect().map { r =>
      (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))
    }.toSet
    assert(got == expected && got.size == months.size)
  }
}
