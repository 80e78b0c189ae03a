package graft

import org.apache.spark.sql.functions._

/** q_class_weights, q_embed_norm_audit, q_join_skew_audit,
  * q_quality_gate, q_knn_graph on the sf0.001 fixtures. */
class CurationGateKnnSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"
  private def q(key: String) = SparkEntry.queries(key)(spark, dir)

  test("class weights: shares sum to ~1e6, weighted mass is balanced") {
    val rows = q("q_class_weights").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    val l = rows.length.toLong
    assert(rows.map(_._2).sum == n, "label counts partition the set")
    val shareSum = rows.map(_._3).sum
    assert(math.abs(shareSum - 1000000L) <= l,
      s"shares sum $shareSum must be 1e6 up to truncation")
    rows.foreach { case (label, c, share, w) =>
      assert(share == c * 1000000L / n, s"label $label share")
      assert(w == n * 1000000L / (l * c), s"label $label weight")
      // balanced rule: weight * count ≈ N/L for every class
      val mass = w * c
      assert(math.abs(mass - n * 1000000L / l) <= w,
        s"label $label weighted mass $mass not balanced")
    }
  }

  test("embedding norm audit matches a driver fold; probe degenerate flagged") {
    val raw = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("label"), col("embedding"))
      .collect().map(r => (r.getInt(0).toString, r.getSeq[Float](1)))
    // the operator's planted all-zero '__probe' vector (r10 vacuity
    // fix) — corpus dim count, norm exactly 0
    val vecs = raw :+ ("__probe", raw.head._2.map(_ => 0.0f))
    val expected = vecs.groupBy(_._1).map { case (lab, xs) =>
      val qs = xs.map { case (_, v) =>
        var acc = 0.0
        v.foreach(x => acc += x.toDouble * x.toDouble)
        math.floor(math.sqrt(acc) * 1e6).toLong
      }
      (lab, xs.length.toLong, qs.min, qs.max, qs.sum / qs.length,
        qs.count(_ < 1000L).toLong)
    }.toSet
    val got = q("q_embed_norm_audit").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == expected && got.nonEmpty)
    // the degenerate detector fires on the probe and only the probe
    assert(got.exists(r => r._1 == "__probe" && r._6 == 1L),
      "planted zero vector not counted degenerate")
    assert(got.filter(_._1 != "__probe").forall(_._6 == 0L),
      "a natural label has degenerate vectors")
  }

  test("join-skew audit matches a driver replay of the count frame") {
    val counts = spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_suppkey").count().collect().map(_.getLong(1)).sorted
    val row = q("q_join_skew_audit").collect() match { case Array(r) => r }
    val (nk, nr, mx, mean, p99, skew, salt) = (row.getLong(0), row.getLong(1),
      row.getLong(2), row.getLong(3), row.getLong(4), row.getLong(5),
      row.getLong(6))
    assert(nk == counts.length && nr == counts.sum && mx == counts.max)
    assert(mean == counts.sum / counts.length)
    // p99 = element at ceil(0.99 * nk) in (count, key) order; count-only
    // sort agrees on the count value
    assert(p99 == counts((((nk * 99) + 99) / 100 - 1).toInt))
    assert(skew == mx * 1000000L / mean)
    assert(salt == math.max(1L, mx / (4 * mean)))
  }

  test("quality gate counts match a driver replay; reasons overlap freely") {
    // the corpus plus the three planted violators (r10 vacuity fix):
    // too-long, low-alpha, digit-heavy probes the shipped docs never trip
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("n_chars"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))) ++
      Seq("ab" * 10500, ". " * 60, "1a" * 60).map(t => (t.length.toLong, t))
    def alpha(t: String) = t.toLowerCase.count(c => c >= 'a' && c <= 'z').toLong
    def digit(t: String) = t.count(c => c >= '0' && c <= '9').toLong
    val flags = docs.map { case (n, t) =>
      (n < 100, n > 20000, alpha(t) * 2 < n, digit(t) * 10 > n * 3)
    }
    val row = q("q_quality_gate").collect() match { case Array(r) => r }
    assert(row.getLong(0) == docs.length)
    assert(row.getLong(1) == flags.count(f => !f._1 && !f._2 && !f._3 && !f._4))
    assert(row.getLong(2) == flags.count(_._1))
    assert(row.getLong(3) == flags.count(_._2))
    assert(row.getLong(4) == flags.count(_._3))
    assert(row.getLong(5) == flags.count(_._4))
    assert(row.getLong(1) > 0, "gate must accept something at sf0.001")
    // every reason counter fires — an all-zero counter is
    // indistinguishable from a broken one
    (2 to 5).foreach(i =>
      assert(row.getLong(i) > 0, s"reason counter #$i never fired"))
  }

  test("kNN graph: ranks dense from 1, neighbors share the query's cell") {
    val got = q("q_knn_graph").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty)
    got.groupBy(_._1).foreach { case (v, ns) =>
      val ordered = ns.sortBy(_._2)
      assert(ordered.map(_._2).toSeq == (1 to ns.length).toSeq,
        s"vec $v ranks not dense")
      // scores non-increasing with rank; ties broken by neighbor id
      ordered.sliding(2).filter(_.length == 2).foreach { case Array(a, b) =>
        assert(a._4 > b._4 || (a._4 == b._4 && a._3 < b._3),
          s"vec $v rank order violated")
      }
      assert(ns.forall(_._3 != v), s"vec $v lists itself")
      assert(ns.length <= 3)
    }
  }
}
