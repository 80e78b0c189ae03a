package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

class TextAnalysisSpec extends GraftSuite {
  import spark.implicits._

  test("token counts: whitespace and BPE-ish") {
    val df = Seq("Hello, world! 42 times").toDF("t")
    val ws = df.select(TextAnalysis.tokenCount(col("t"))).as[Int].head()
    val bpe = df.select(TextAnalysis.bpeTokenCount(col("t"))).as[Int].head()
    assert(ws == 4)
    // hello , world ! 42 times → 6
    assert(bpe == 6)
  }

  test("occurrences counts non-overlapping literal hits") {
    val df = Seq(" the cat the dog the ").toDF("t")
    val n = df.select(TextAnalysis.occurrences(col("t"), " the ")).as[Int].head()
    // left-to-right non-overlapping scan finds 3 hits (the single space
    // between words serves each match once) — same as DuckDB's replace()
    assert(n == 3)
  }

  test("langId picks the language with the most marker hits") {
    val df = Seq(
      "the cat and the dog of the house",
      "el gato de la casa el perro de",
      "qwerty zzz").toDF("text")
    val out = df.select(TextAnalysis.langId(col("text"))).as[String].collect()
    assert(out.toSeq == Seq("en", "es", "und"))
  }

  test("fingerprint is deterministic, order-sensitive, and bounded") {
    val df = Seq("abc", "abc", "acb").toDF("t")
    val fps = df.select(TextAnalysis.fingerprint(col("t"))).as[Long].collect()
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
    assert(fps.forall(f => f >= 0 && f < TextAnalysis.FingerprintMod))
    // hand-check: ((0*31+97)*31+98)*31+99 = 97*31*31+98*31+99
    assert(fps(0) == 97L * 31 * 31 + 98L * 31 + 99L)
  }

  test("shingles produce distinct k-grams; short docs yield one shingle") {
    val df = Seq("a b c d", "a b").toDF("t")
    val sh = df.select(TextAnalysis.shingles(col("t"), 3).as("s"))
      .as[Seq[String]].collect()
    assert(sh(0).toSet == Set("a b c", "b c d"))
    assert(sh(1).toSeq == Seq("a b"))
  }

  test("quality stats match hand counts; case-insensitive") {
    val df = Seq("aeiou xyz!").toDF("t")
    val r = df.select(
      TextAnalysis.charCount(col("t")).as("c"),
      TextAnalysis.vowelCount(col("t")).as("v"),
      TextAnalysis.nonAlnumCount(col("t")).as("m")).head()
    assert(r.getInt(0) == 10)
    assert(r.getInt(1) == 5)
    assert(r.getInt(2) == 1) // the '!'
    // capitals are letters, not punctuation marks; capital vowels count
    val up = Seq("The CEO Of IBM!").toDF("t").select(
      TextAnalysis.vowelCount(col("t")).as("v"),
      TextAnalysis.nonAlnumCount(col("t")).as("m")).head()
    assert(up.getInt(0) == 5) // "the ceo of ibm!" → e, e, o, o, i
    assert(up.getInt(1) == 1) // only '!'
  }
  test("repetition-ratio ingredients: distinct shingles vs total k-grams") {
    // "a b c a b c": 4 total 3-grams, 3 distinct → rep_ratio 0.25
    val r = Seq("a b c a b c").toDF("t").select(
      size(TextAnalysis.hashedShingles(col("t"), 3)).as("d"),
      greatest(TextAnalysis.tokenCount(col("t")) - 2, lit(1)).as("n")).head()
    assert(r.getInt(0) == 3 && r.getInt(1) == 4)
    // short doc: one shingle over one slot → ratio 0
    val s = Seq("a b").toDF("t").select(
      size(TextAnalysis.hashedShingles(col("t"), 3)).as("d"),
      greatest(TextAnalysis.tokenCount(col("t")) - 2, lit(1)).as("n")).head()
    assert(s.getInt(0) == 1 && s.getInt(1) == 1)
  }

  test("redactPii scrubs emails and phones; counts match the scrub") {
    val df = Seq(
      "reach me at jo.doe+spam@mail-host.org or +7 (900) 123-45-67 today",
      "no pii here at all",
      "two mails: a@b.io c@d.co and digits 12",
    ).toDF("t")
    val out = df.select(
      TextAnalysis.countPattern(col("t"), TextAnalysis.EmailRe).as("ne"),
      TextAnalysis.redactPii(col("t")).as("clean")).collect()
    assert(out(0).getInt(0) == 1)
    assert(out(0).getString(1) == "reach me at <EMAIL> or <PHONE> today")
    assert(out(1).getString(1) == "no pii here at all")
    assert(out(2).getInt(0) == 2)
    assert(out(2).getString(1) == "two mails: <EMAIL> <EMAIL> and digits 12")
  }
}
