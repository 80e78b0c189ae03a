package graft

import org.apache.spark.sql.functions._

/** q_bpe_pairs, q_lang_confusion, q_approx_quantile_audit: hand
  * recomputation on sf0.001 and the top-k / audit contracts. */
class CorpusAuditSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"
  private def q(key: String) = SparkEntry.queries(key)(spark, dir)

  private def docs = spark.read.parquet(s"$dir/documents.parquet")

  test("BPE pair counts match a hand recomputation over word types") {
    val freq = docs.select("text").collect()
      .flatMap(_.getString(0).trim.toLowerCase.split("\\s+"))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val pairCnt = collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    freq.foreach { case (w, f) =>
      if (w.length >= 2)
        (0 until w.length - 1).foreach { i =>
          pairCnt(w.substring(i, i + 2)) += f
        }
    }
    val expected = pairCnt.toSeq.sortBy { case (p, c) => (-c, p) }.take(20)
    val got = q("q_bpe_pairs").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expected)
  }

  test("BPE top-k is TakeOrderedAndProject, not a global sort") {
    val plan = q("q_bpe_pairs").queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"global sort for a top-20:\n$plan")
  }

  test("language confusion matrix covers the corpus and uses known labels") {
    val rows = q("q_lang_confusion").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(rows.map(_._3).sum == docs.count())
    val langs = Set("en", "es", "de", "fr", "zh")
    assert(rows.map(_._1).toSet.subsetOf(langs))
    assert(rows.map(_._2).toSet.subsetOf(langs - "zh" + "und"),
      "guesses come from the marker languages plus 'und'")
    // row sums reproduce the per-language corpus counts
    val byLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy(_._1).foreach { case (l, g) =>
      assert(g.map(_._3).sum == byLang(l), s"row sum for $l")
    }
  }

  test("approx quantiles stay inside the 1% audit band against exact rank selection") {
    val out = q("q_approx_quantile_audit").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getBoolean(3), s"${r.getString(0)}: sketch drifted past 1%")
      assert(r.getDouble(1) <= r.getDouble(2), "p50 <= p95")
    }
  }
}
