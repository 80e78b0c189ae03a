package graft

/** q_dup_spans: driver-side recomputation of the exact-substring span
  * merge on the sf0.001 fixtures, plus the dictionary-filter plan shape.
  */
class DupSpansSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"
  private def q(key: String) = SparkEntry.queries(key)(spark, dir)

  test("span stats match a driver-side k-gram walk") {
    val k = 5
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.trim.split("\\s+").toSeq)
    val grams = docs.flatMap { case (id, toks) =>
      if (toks.length >= k)
        (0 to toks.length - k).map(i => (id, i + 1, toks.slice(i, i + k).mkString(" ")))
      else Seq.empty
    }
    val hot = grams.groupBy(_._3).collect {
      case (g, occ) if occ.map(_._1).distinct.size >= 2 => g
    }.toSet
    val expected = docs.map { case (id, toks) =>
      val pos = grams.collect { case (`id`, p, g) if hot(g) => p.toLong }.sorted
      // span [p, p+k-1]; merge when the next start touches or overlaps
      // the running token-range end (the query's pos > prevEnd+1 rule)
      var spans = 0L; var dup = 0L
      var curS = -1L; var curEnd = -1L
      pos.foreach { p =>
        if (spans == 0 || p > curEnd + 1) {
          if (spans > 0) dup += curEnd - curS + 1
          spans += 1; curS = p; curEnd = p + (k - 1)
        } else curEnd = math.max(curEnd, p + (k - 1))
      }
      if (spans > 0) dup += curEnd - curS + 1
      id -> ((toks.length.toLong, spans, dup))
    }.toMap
    val got = q("q_dup_spans").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected,
      s"diverges at ${got.keys.find(id => got(id) != expected(id))}")
    assert(expected.values.exists(_._2 > 0), "fixture must contain cross-doc spans")
  }

  test("only hot grams flow into the position join (dictionary filtered first)") {
    val plan = q("q_dup_spans").queryExecution.optimizedPlan.toString
    assert(plan.contains(">= 2") || plan.contains("(__df#"),
      s"df filter must precede the join back:\n$plan")
    val physical = q("q_dup_spans").queryExecution.executedPlan.toString
    assert(!physical.contains("CartesianProduct") &&
      !physical.contains("BroadcastNestedLoopJoin"),
      s"gram join must be the co-partitioned equi-join:\n$physical")
  }
}
