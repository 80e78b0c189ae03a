package graft

import org.apache.spark.sql.functions._
import graft.operators.PrefixSum

class PrefixSumSpec extends GraftSuite {
  import spark.implicits._

  test("distributed running total equals the window cumsum, without the global window") {
    val df = (1 to 997).map(i => (i.toLong, (i * 7 % 13).toLong)).toDF("k", "x")
      .repartition(8)
    val dist = PrefixSum.runningTotal(df, "k", "x")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val w = org.apache.spark.sql.expressions.Window.orderBy("k")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val expected = df.withColumn("cum", sum("x").over(w))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(dist == expected)
  }

  test("withRankAndRunningTotal equals withGlobalRank + runningTotal") {
    val df = (1 to 997).map(i => ((i * 31 % 1009).toLong, (i * 7 % 13).toLong))
      .toDF("k", "x").repartition(8)
    val combined = PrefixSum.withRankAndRunningTotal(df, Seq("k"), "x", "__r", "rt")
      .collect().map(r => (r.getLong(0), (r.getLong(2), r.getLong(3)))).toMap
    val ranked = PrefixSum.withGlobalRank(df, Seq("k"), "__r")
    val expected = PrefixSum.runningTotal(ranked, "__r", "x")
      .join(ranked.select(col("k"), col("__r")), Seq("__r"))
      .collect().map(r => (r.getLong(3), (r.getLong(0), r.getLong(2)))).toMap
    assert(combined == expected)
  }

  test("multi-column runningTotals equals per-column runningTotal, in one scan") {
    val df = (1 to 997).map { i =>
      (i.toLong, (i * 7 % 13).toLong, (i * 11 % 17).toLong, (i * 3 % 5).toLong)
    }.toDF("k", "a", "b", "c").repartition(8)
    val multi = PrefixSum.runningTotals(df, "k", Seq("a", "b", "c"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    val singles = Seq("a", "b", "c").map { c =>
      PrefixSum.runningTotal(df, "k", c)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    }
    (1 to 997).foreach { i =>
      val k = i.toLong
      assert(multi(k) == ((singles(0)(k), singles(1)(k), singles(2)(k))),
        s"k=$k: multi ${multi(k)} != singles")
    }
    // and the value columns pass through unchanged
    val vals = PrefixSum.runningTotals(df, "k", Seq("a", "b", "c"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    (1 to 997).foreach { i =>
      assert(vals(i.toLong) ==
        (((i * 7 % 13).toLong, (i * 11 % 17).toLong, (i * 3 % 5).toLong)))
    }
  }

  test("packByBudget bins documents by starting offset; bins respect the budget boundary") {
    // tokens: 1000, 1000, 1000 with budget 2048 → starts 0, 1000, 2000 → packs 0, 0, 0;
    // the 4th doc starts at 3000 → pack 1
    val docs = Seq((1L, 1000L), (2L, 1000L), (3L, 1000L), (4L, 500L))
      .toDF("doc_id", "n_tokens")
    val out = PrefixSum.packByBudget(docs, "doc_id", "n_tokens", 2048L)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1)
    assert(out.toSeq == Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 1L)))
  }

  test("exclusive running max equals the lagged window max, carries all columns") {
    val df = (1 to 613).map(i => (i.toLong, ((i * 31) % 97).toLong, s"tag$i"))
      .toDF("k", "v", "tag").repartition(8)
    val dist = PrefixSum.runningMaxExclusive(df, "k", "v")
      .collect().map(r => (r.getLong(0), (Option(r.get(3)).map(_.asInstanceOf[Long]), r.getString(2))))
      .toMap
    var best = Option.empty[Long]
    (1 to 613).foreach { i =>
      val (pm, tag) = dist(i.toLong)
      assert(pm == best, s"row $i: prev_max $pm != $best")
      assert(tag == s"tag$i", "non-value columns must pass through")
      val v = ((i * 31) % 97).toLong
      if (best.forall(_ < v)) best = Some(v)
    }
  }

  test("null token counts count as zero") {
    val docs = Seq((1L, Some(10L)), (2L, None), (3L, Some(5L))).toDF("doc_id", "n")
    val out = PrefixSum.runningTotal(docs, "doc_id", "n")
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1)
    assert(out.toSeq == Seq((1L, 10L), (2L, 10L), (3L, 15L)))
  }

  test("property: global rank equals the local sort rank for arbitrary data/partitioning") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Prop.forAll
    val rows = Gen.chooseNum(1, 120).flatMap { n =>
      Gen.listOfN(n, Gen.zip(Gen.chooseNum(-50L, 50L), Gen.alphaLowerStr.map(_.take(3))))
    }
    val prop = forAll(rows, Gen.chooseNum(1, 9)) { (data, parts) =>
      // unique composite key: append an index so the order contract holds
      val indexed = data.zipWithIndex.map { case ((v, t), i) => (v, s"$t$i") }
      val df = indexed.toDF("v", "t").repartition(parts)
      val got = PrefixSum.withGlobalRank(df, Seq("v", "t"), "r").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      val expected = indexed.sorted.zipWithIndex.map { case ((v, t), i) => (v, t, i + 1L) }
      Prop(got.sortBy(_._3).toSeq == expected.toSeq)
    }
    val result = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(result.passed, s"property failed: ${result.status}")
  }

  test("property: running total and pack assignment match an in-memory scan") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Prop.forAll
    val rows = Gen.chooseNum(1, 150).flatMap { n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 500L))
    }
    val prop = forAll(rows, Gen.chooseNum(1, 9), Gen.chooseNum(64L, 1024L)) {
      (tokens, parts, budget) =>
        val indexed = tokens.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        val df = indexed.toDF("id", "n").repartition(parts)
        val cums = tokens.scanLeft(0L)(_ + _).tail
        val expTotals = indexed.map(_._1).zip(cums).toMap
        val expPacks = indexed.map(_._1).zip(
          cums.zip(tokens).map { case (c, t) => (c - t) / budget }).toMap
        val gotTotals = PrefixSum.runningTotal(df, "id", "n")
          .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
        val gotPacks = PrefixSum.packByBudget(df, "id", "n", budget)
          .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
        Prop(gotTotals == expTotals && gotPacks == expPacks)
    }
    val result = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(result.passed, s"property failed: ${result.status}")
  }
}
