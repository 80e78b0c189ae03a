package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends GraftSuite {
  import spark.implicits._

  test("withFakeMedia produces a binary column with typed metadata") {
    val docs = Seq((0L, "hello"), (1L, "world")).toDF("doc_id", "text")
    val m = Multimodal.withFakeMedia(docs, "doc_id", "text").collect()
    assert(m(0).getAs[Array[Byte]]("media").sameElements("hello".getBytes("UTF-8")))
    assert(m.map(_.getAs[String]("media_type")).toSet == Set("image/png", "audio/wav"))
  }

  test("extractFeatures is deterministic and partition-local") {
    val docs = Seq((0L, "hello"), (1L, "world")).toDF("doc_id", "text")
    val media = Multimodal.withFakeMedia(docs, "doc_id", "text")
    val f1 = Multimodal.extractFeatures(media).orderBy("doc_id").collect()
    val f2 = Multimodal.extractFeatures(media).orderBy("doc_id").collect()
    assert(f1.map(_.toString).toSeq == f2.map(_.toString).toSeq)
    assert(f1.forall(_.getInt(2) == 5)) // n_bytes of 5-char ascii payload
    assert(f1.forall(r => r.getInt(3) >= 16 && r.getInt(4) >= 16))
    val plan = Multimodal.extractFeatures(media).queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("exchange"), s"decode must be map-only:\n$plan")
  }

  test("output schema matches the declared contract") {
    val docs = Seq((0L, "x")).toDF("doc_id", "text")
    val out = Multimodal.extractFeatures(Multimodal.withFakeMedia(docs, "doc_id", "text"))
    assert(out.schema == Multimodal.featureSchema)
  }
}
