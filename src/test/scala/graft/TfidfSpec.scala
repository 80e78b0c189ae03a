package graft

import org.apache.spark.sql.functions._
import graft.operators.Tfidf

class TfidfSpec extends GraftSuite {
  import spark.implicits._

  private def docs = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "cherry cherry durian"),
  ).toDF("doc_id", "text")

  test("scores match hand computation (tf * ln(N/df), 6dp)") {
    val out = Tfidf.topTerms(docs, "doc_id", "text", k = 3)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    // N=3; df: apple 1, banana 2, cherry 2, durian 1
    val ln3 = math.log(3.0)
    val ln15 = math.log(1.5)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out((1L, "apple")) == (2L, r6(2 * ln3)))
    assert(out((1L, "banana")) == (1L, r6(ln15)))
    assert(out((3L, "cherry")) == (2L, r6(2 * ln15)))
    assert(out((3L, "durian")) == (1L, r6(ln3)))
  }

  test("rank is per-document, score-desc with term tiebreak, capped at k") {
    val out = Tfidf.topTerms(docs, "doc_id", "text", k = 1)
    assert(out.count() == 3L) // one term per doc
    val top1 = out.filter($"doc_id" === 1L).collect().head
    assert(top1.getString(1) == "apple") // 2·ln3 beats 1·ln1.5
    assert(top1.getInt(4) == 1)
  }

  test("tokenization lowercases and drops empty tokens") {
    val d = Seq((1L, "  Apple APPLE  "), (2L, "x")).toDF("doc_id", "text")
    val out = Tfidf.topTerms(d, "doc_id", "text", k = 3)
      .filter($"doc_id" === 1L).collect()
    assert(out.length == 1 && out.head.getString(1) == "apple" && out.head.getLong(2) == 2L)
  }

  test("the plan has no all-pairs join: the only cross join is the 1-row N scalar") {
    val plan = Tfidf.topTerms(docs, "doc_id", "text", k = 3)
      .queryExecution.optimizedPlan.toString
    val crossJoins = "Join Cross".r.findAllIn(plan).size
    assert(crossJoins == 1, s"expected exactly the 1-row N cross join, got $crossJoins:\n$plan")
    assert("Join Inner, \\(term".r.findFirstIn(plan).isDefined,
      s"document-frequency join must be an equi-join on the term key:\n$plan")
  }
}
