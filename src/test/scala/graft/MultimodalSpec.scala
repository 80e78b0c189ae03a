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

  test("resizeAll is map-only and produces the declared dimensions") {
    val docs = Seq((0L, "hello world document"), (1L, "another")).toDF("doc_id", "text")
    val media = Multimodal.withFakeMedia(docs, "doc_id", "text")
    val resized = Multimodal.resizeAll(media, 32, 24)
    val rows = resized.orderBy("doc_id").collect()
    assert(rows.forall(r => r.getInt(2) == 32 && r.getInt(3) == 24))
    assert(rows.forall(_.getAs[Array[Byte]](1).nonEmpty))
    val plan = resized.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("exchange"), s"resize must be map-only:\n$plan")
  }

  test("sampleFrames yields n deterministic frames per item, map-only") {
    val docs = Seq((0L, "a somewhat longer video-like payload here")).toDF("doc_id", "text")
    val media = Multimodal.withFakeMedia(docs, "doc_id", "text")
    val frames = Multimodal.sampleFrames(media, 4)
    val rows = frames.orderBy("frame_idx").collect()
    assert(rows.map(_.getInt(1)).toSeq == Seq(0, 1, 2, 3))
    val again = Multimodal.sampleFrames(media, 4).orderBy("frame_idx").collect()
    assert(rows.map(_.getAs[Array[Byte]](2).toSeq).toSeq ==
      again.map(_.getAs[Array[Byte]](2).toSeq).toSeq)
    val plan = frames.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("exchange"), s"frame-sample must be map-only:\n$plan")
  }

  test("output schema matches the declared contract") {
    val docs = Seq((0L, "x")).toDF("doc_id", "text")
    val out = Multimodal.extractFeatures(Multimodal.withFakeMedia(docs, "doc_id", "text"))
    assert(out.schema == Multimodal.featureSchema)
  }
}
