package graft

import org.apache.spark.sql.functions._

/** q_corpus_build (op 200) — the end-to-end curation funnel. */
class CorpusBuildSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"

  test("funnel counts match a driver replay and are monotone") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("n_chars"), col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    def alpha(t: String) = t.toLowerCase.count(c => c >= 'a' && c <= 'z').toLong
    def digit(t: String) = t.count(c => c >= '0' && c <= '9').toLong
    val accepted = docs.filter { case (_, n, t) =>
      !(n < 100 || n > 20000 || alpha(t) * 2 < n || digit(t) * 10 > n * 3)
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    def fp(t: String): String = md.digest(
      t.trim.toLowerCase.replaceAll("\\s+", " ").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val unique = accepted.groupBy(d => fp(d._3)).values
      .map(_.minBy(_._1)).toSeq.sortBy(_._1)
    val ntoks = unique.map(d => d._3.toLowerCase.trim.split("\\s+").length.toLong)
    val cums = ntoks.scanLeft(0L)(_ + _).tail
    val packs = cums.zip(ntoks).map { case (c, n) => (c - n) / 2048 }.distinct.size
    val row = SparkEntry.queries("q_corpus_build")(spark, dir)
      .collect() match { case Array(r) => r }
    assert(row.getLong(0) == docs.length, "n_input")
    assert(row.getLong(1) == accepted.length, "n_accepted")
    assert(row.getLong(2) == unique.size, "n_unique")
    assert(row.getLong(3) == ntoks.sum, "n_tokens")
    assert(row.getLong(4) == packs, "n_packs")
    assert(row.getLong(0) >= row.getLong(1) && row.getLong(1) >= row.getLong(2),
      "funnel must be monotone")
    assert(row.getLong(5) == (accepted.length - unique.size) * 1000000L / accepted.length)
    assert(row.getLong(6) == unique.size * 1000000L / docs.length)
    assert(row.getLong(2) > 0 && row.getLong(4) > 0, "non-vacuous funnel")
  }
}
