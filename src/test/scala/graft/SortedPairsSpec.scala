package graft

import org.apache.spark.sql.functions._
import graft.functions.NativeVec

/** `sorted_pairs` replaced the interpreted
  * flatten(transform(.., transform(slice(..)))) lambda chain in the
  * co-occurrence pair generators (copurchaseEdges, q_bipartite_project,
  * q_assoc_rules) — this pins the native fan-out to the declarative
  * form it replaced: same pairs, same order, same edge cases. */
class SortedPairsSpec extends GraftSuite {
  import spark.implicits._

  private val lambdaPairs =
    """flatten(transform(ps, (x, i) ->
      |  transform(slice(ps, i + 2, size(ps)),
      |            y -> struct(x AS a, y AS b))))"""
      .stripMargin.replace("\n", " ")

  test("native sorted_pairs equals the declarative lambda fan-out") {
    val df = Seq(
      (1L, Seq(3L, 7L, 9L, 12L)),
      (2L, Seq(5L)), // single element: no pairs
      (3L, Seq.empty[Long]), // empty: no pairs
      (4L, (1L to 40L)) // C(40,2) = 780
    ).toDF("k", "ps")
    val native = df.select(col("k"),
        explode(NativeVec.sorted_pairs(col("ps"))).as("e"))
      .select(col("k"), col("e.a"), col("e.b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val declarative = df.select(col("k"), explode(expr(lambdaPairs)).as("e"))
      .select(col("k"), col("e.a"), col("e.b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(native == declarative) // order included
    assert(native.count(_._1 == 4L) == 780)
  }

  test("sorted_pairs widens ARRAY<INT> and nulls propagate") {
    val df = Seq((1, Option(Seq(2, 5, 8))), (2, None))
      .toDF("k", "ps")
    val out = df.select(col("k"), NativeVec.sorted_pairs(col("ps")).as("pp"))
      .collect()
    val pairs = out.find(_.getInt(0) == 1).get.getSeq[org.apache.spark.sql.Row](1)
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))) ==
      Seq((2L, 5L), (2L, 8L), (5L, 8L)))
    assert(out.find(_.getInt(0) == 2).get.isNullAt(1))
  }
}
