package graft

import org.apache.spark.sql.functions._

/** q_bpe_apply, q_raking, q_capture_recapture: exact driver replays on
  * sf0.001 plus the raking convergence contract (weighted margins
  * approach the order-volume targets). */
class RakingCaptureSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"
  private def q(key: String) = SparkEntry.queries(key)(spark, dir)

  private def replayWords(): Map[String, Long] = {
    var words: Map[String, Long] = spark.read
      .parquet(s"$dir/documents.parquet")
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
      .collect().map(_.getString(0)).filter(_.length >= 2)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
      .map { case (w, f) => (" " + w.toCharArray.mkString("", " ", " "), f) }
    (1 to 5).foreach { _ =>
      val counts = collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (rep, f) =>
        rep.split(" ").filter(_.nonEmpty).sliding(2).foreach {
          case Array(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _ =>
        }
      }
      val ((a, b), _) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
      val (pat, sub) = (s" $a $b ", s" $a$b ")
      words = words.groupBy { case (rep, _) =>
        rep.replace(pat, sub).replace(pat, sub)
      }.view.mapValues(_.values.sum).toMap
    }
    words
  }

  test("BPE apply top-20 matches the replayed merged vocabulary") {
    val expected = replayWords().toSeq
      .flatMap { case (rep, f) =>
        rep.split(" ").filter(_.nonEmpty).map(_ -> f)
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .sortBy { case (t, f) => (-f, t) }.take(20)
    val got = q("q_bpe_apply").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expected)
  }

  test("raking matches an exact fixed-point IPF replay and converges") {
    val cust = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey").cast("long"), col("c_nationkey").cast("long"),
        col("c_mktsegment")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_custkey").collect().map(_.getLong(0))
    val byCust = cust.map(c => c._1 -> ((c._2, c._3))).toMap
    val rowT = orders.map(byCust).groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val colT = orders.map(byCust).groupBy(_._2).view.mapValues(_.size.toLong).toMap
    var cells = cust.groupBy(c => (c._2, c._3)).map { case (k, xs) =>
      k -> (xs.length.toLong, BigInt(1000000))
    }
    // round-half-up in exact integers, as (2·num + den) div (2·den)
    (1 to 5).foreach { _ =>
      val rs = cells.groupBy(_._1._1)
        .view.mapValues(_.values.map { case (n, w) => BigInt(n) * w }.sum).toMap
      cells = cells.map { case (k @ (nk, _), (n, w)) =>
        k -> (n, (2 * w * rowT(nk) * 1000000 + rs(nk)) / (2 * rs(nk)))
      }
      val cs = cells.groupBy(_._1._2)
        .view.mapValues(_.values.map { case (n, w) => BigInt(n) * w }.sum).toMap
      cells = cells.map { case (k @ (_, seg), (n, w)) =>
        k -> (n, (2 * w * colT(seg) * 1000000 + cs(seg)) / (2 * cs(seg)))
      }
    }
    val expected = cells.map { case ((nk, seg), (n, w)) =>
      (nk, seg, n, w.toLong)
    }.toSet
    val got = q("q_raking").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected && got.nonEmpty)
    // convergence: weighted column margins within 1% of the targets
    // (the last half-step fitted columns exactly up to rounding)
    val wc = cells.toSeq.groupBy(_._1._2).view.mapValues(
      _.map { case (_, (n, w)) => BigInt(n) * w }.sum).toMap
    colT.foreach { case (seg, t) =>
      val fitted = wc(seg).toDouble / 1e6
      assert(math.abs(fitted - t) / t < 0.01,
        s"segment $seg: fitted $fitted vs target $t")
    }
  }

  test("Chapman estimate matches a driver replay and is within 25%") {
    val ids = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    val n1 = ids.count(_ % 3 == 0).toLong
    val n2 = ids.count(_ % 5 < 2).toLong
    val m = ids.count(i => i % 3 == 0 && i % 5 < 2).toLong
    val nHat = (n1 + 1) * (n2 + 1) / (m + 1) - 1
    val row = q("q_capture_recapture").collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
      row.getLong(4)) == ((ids.length.toLong, n1, n2, m, nHat)))
    assert(math.abs(row.getLong(5)) < 250000,
      s"estimator off by ${row.getLong(5)} ppm — captures not independent?")
  }
}
