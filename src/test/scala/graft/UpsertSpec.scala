package graft

import graft.operators.Upsert

class UpsertSpec extends GraftSuite {
  import spark.implicits._

  private def base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
    .toDF("id", "name", "bal")

  test("update: matched rows take update values, unmatched updates dropped") {
    val updates = Seq((2L, 99.0), (7L, 77.0)).toDF("id", "bal")
    val out = Upsert.update(base, updates, "id", Seq("bal"))
      .orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(out.map(_.getDouble(2)).toSeq == Seq(10.0, 99.0, 30.0))
    assert(out.map(_.getString(1)).toSeq == Seq("a", "b", "c"))
  }

  test("merge: matched rows updated, unmatched updates appended") {
    val updates = Seq((2L, "B", 99.0), (7L, "g", 77.0)).toDF("id", "name", "bal")
    val out = Upsert.merge(base, updates, "id").orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 7L))
    assert(out.map(_.getDouble(2)).toSeq == Seq(10.0, 99.0, 30.0, 77.0))
    assert(out.map(_.getString(1)).toSeq == Seq("a", "B", "c", "g"))
  }
}
