package graft

import org.apache.spark.sql.functions._

import graft.operators.QuantileSketch

class QuantileSketchSpec extends GraftSuite {
  import spark.implicits._

  private def values(n: Int) =
    (1 to n).map(i => ("k", i.toDouble)).toDF("key", "v")

  test("merge of split states equals the state over the whole batch") {
    val all = values(1000)
    val whole = QuantileSketch.state(all, "key", "v")
    val merged = QuantileSketch.merge("key",
      QuantileSketch.state(all.filter($"v" <= 300), "key", "v"),
      QuantileSketch.state(all.filter($"v" > 300 && $"v" <= 700), "key", "v"),
      QuantileSketch.state(all.filter($"v" > 700), "key", "v"))
    val a = whole.orderBy("bucket").collect().map(r => (r.getLong(1), r.getLong(2)))
    val b = merged.orderBy("bucket").collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(a.toSeq == b.toSeq)
  }

  test("quantile estimates are within the alpha relative-error bound") {
    val alpha = 0.01
    val n = 2000
    val est = QuantileSketch.quantiles(
      QuantileSketch.state(values(n), "key", "v", alpha), "key",
      Seq("p10" -> 0.1, "p50" -> 0.5, "p95" -> 0.95, "p100" -> 1.0), alpha)
      .collect().head
    // exact nearest-rank values of 1..n: v_r = ceil(q*n)
    Seq(("p10", 0.1), ("p50", 0.5), ("p95", 0.95), ("p100", 1.0)).zipWithIndex
      .foreach { case ((name, q), i) =>
        val exact = math.ceil(q * n)
        val got = est.getDouble(i + 1)
        assert(math.abs(got - exact) / exact <= alpha + 1e-9,
          s"$name: got $got, exact $exact")
      }
  }

  test("bound holds on skewed (log-normal-ish) data and across merges") {
    val alpha = 0.02
    // deterministic skew: v = exp(hash-ish mix), spanning ~8 decades
    val df = (1 to 5000).map { i =>
      val u = ((i * 2654435761L) % 10007).toDouble / 10007.0
      ("k", math.exp(u * 18.0 - 2.0))
    }.toDF("key", "v")
    val sorted = df.collect().map(_.getDouble(1)).sorted
    val s1 = QuantileSketch.state(df.filter($"v" < 100), "key", "v", alpha)
    val s2 = QuantileSketch.state(df.filter($"v" >= 100), "key", "v", alpha)
    val est = QuantileSketch.quantiles(
      QuantileSketch.merge("key", s1, s2), "key",
      Seq("p50" -> 0.5, "p99" -> 0.99), alpha).collect().head
    Seq((0.5, 1), (0.99, 2)).foreach { case (q, i) =>
      val exact = sorted(math.ceil(q * sorted.length).toInt - 1)
      assert(math.abs(est.getDouble(i) - exact) / exact <= alpha + 1e-9,
        s"q=$q: got ${est.getDouble(i)}, exact $exact")
    }
  }

  test("state size is O(log range), not O(rows)") {
    val st = QuantileSketch.state(values(100000), "key", "v", alpha = 0.01)
    val buckets = st.count()
    // 1..1e5 spans 5 decades; at gamma≈1.0202 that is ~ln(1e5)/ln(γ) ≈ 576
    assert(buckets < 700, s"state has $buckets buckets")
  }

  test("multiple keys stay independent") {
    val df = (1 to 100).flatMap(i =>
      Seq(("lo", i.toDouble), ("hi", i * 1000.0))).toDF("key", "v")
    val out = QuantileSketch.quantiles(
      QuantileSketch.state(df, "key", "v"), "key", Seq("p50" -> 0.5))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(out("lo") - 50) / 50 <= 0.011)
    assert(math.abs(out("hi") - 50000) / 50000 <= 0.011)
  }

  test("non-positive values are rejected loudly") {
    val bad = Seq(("k", 1.0), ("k", 0.0)).toDF("key", "v")
    val e = intercept[Exception] {
      QuantileSketch.state(bad, "key", "v").collect()
    }
    assert(e.getMessage != null)
  }
}
