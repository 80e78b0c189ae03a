package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends GraftSuite {
  import spark.implicits._

  test("withFakeMedia produces a binary column with typed metadata") {
    val docs = Seq((0L, "hello"), (1L, "world")).toDF("doc_id", "text")
    val m = Multimodal.withFakeMedia(docs, "doc_id", "text").orderBy("doc_id").collect()
    // even id: a VALID PNG container wrapping the text (payload + 57
    // bytes of framing); odd id: the raw opaque payload
    assert(m(0).getAs[Array[Byte]]("media").length == 5 + 57)
    assert(m(1).getAs[Array[Byte]]("media").sameElements("world".getBytes("UTF-8")))
    assert(m.map(_.getAs[String]("media_type")).toSet == Set("image/png", "audio/wav"))
  }

  test("decodeHeader parses real PNG / JPEG / GIF headers, rejects junk") {
    // PNG: our own wrapper round-trips through the parser
    assert(Multimodal.decodeHeader(
      Multimodal.pngWrap("payload".getBytes, 640, 480)).contains((640, 480)))
    assert(Multimodal.decodeHeader(
      Multimodal.pngWrap(Array.emptyByteArray, 1, 99999)).contains((1, 99999)))
    // JPEG: SOI + APP0(JFIF) + DQT skipped, then SOF0 with 300x200
    val jpeg = Array[Int](
      0xff, 0xd8, // SOI
      0xff, 0xe0, 0x00, 0x04, 0x4a, 0x46, // APP0, len 4
      0xff, 0xdb, 0x00, 0x03, 0x00, // DQT, len 3
      0xff, 0xc0, 0x00, 0x11, 0x08, 0x00, 0xc8, 0x01, 0x2c, 0x03, // SOF0: h=200 w=300
    ).map(_.toByte)
    assert(Multimodal.decodeHeader(jpeg).contains((300, 200)))
    // progressive JPEG (SOF2) parses too; C4 (DHT) must be skipped not
    // misread as a frame
    val jpeg2 = Array[Int](
      0xff, 0xd8,
      0xff, 0xc4, 0x00, 0x03, 0x00, // DHT, len 3 — NOT a frame header
      0xff, 0xc2, 0x00, 0x11, 0x08, 0x00, 0x10, 0x00, 0x20, 0x01, // SOF2: h=16 w=32
    ).map(_.toByte)
    assert(Multimodal.decodeHeader(jpeg2).contains((32, 16)))
    // GIF: little-endian logical screen 320x64
    val gif = "GIF89a".getBytes("US-ASCII") ++
      Array[Int](0x40, 0x01, 0x40, 0x00, 0x00, 0x00, 0x00).map(_.toByte)
    assert(Multimodal.decodeHeader(gif).contains((320, 64)))
    // junk, truncated, and empty payloads: None, never a throw
    assert(Multimodal.decodeHeader("not an image at all".getBytes).isEmpty)
    assert(Multimodal.decodeHeader(Multimodal.pngWrap("x".getBytes, 10, 10).take(15)).isEmpty)
    assert(Multimodal.decodeHeader(Array.emptyByteArray).isEmpty)
    assert(Multimodal.decodeHeader(Array[Byte](0xff.toByte, 0xd8.toByte)).isEmpty)
  }

  test("extractFeatures decodes real PNG dimensions and falls back to stub") {
    val docs = Seq((0L, "hello"), (1L, "world"), (642L, "x")).toDF("doc_id", "text")
    val media = Multimodal.withFakeMedia(docs, "doc_id", "text")
    val f1 = Multimodal.extractFeatures(media).orderBy("doc_id").collect()
    val f2 = Multimodal.extractFeatures(media).orderBy("doc_id").collect()
    assert(f1.map(_.toString).toSeq == f2.map(_.toString).toSeq)
    // doc 0: PNG header REALLY decoded — width 16+0, height 16+0
    assert(f1(0).getInt(3) == 16 && f1(0).getInt(4) == 16 && f1(0).getBoolean(6))
    assert(f1(0).getInt(2) == 5 + 57)
    // doc 642: dims wrap the id modulus (16 + 642%640 = 18, 16 + 642%480 = 178)
    assert(f1(2).getInt(3) == 18 && f1(2).getInt(4) == 178 && f1(2).getBoolean(6))
    // doc 1: opaque payload → stub fallback, flagged as such
    assert(f1(1).getInt(2) == 5 && !f1(1).getBoolean(6))
    assert(f1(1).getInt(3) >= 16 && f1(1).getInt(4) >= 16)
    // an AUDIO payload whose text happens to start with image magic must
    // NOT be sniffed as an image — the declared media_type gates decode
    val tricky = Multimodal.extractFeatures(Multimodal.withFakeMedia(
      Seq((3L, "GIF89a pretend audio transcript")).toDF("doc_id", "text"),
      "doc_id", "text")).collect().head
    assert(!tricky.getBoolean(6), "declared audio/wav must never header-decode")
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

  test("q_frame_sample slice sizes equal the container-length replay") {
    val dir = "/root/testdata/sf0.001"
    val lens = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0),
        r.getString(1).getBytes("UTF-8").length + (if (r.getLong(0) % 2 == 0) 57 else 0)))
      .toMap
    val want = lens.toSeq.flatMap { case (id, len) =>
      (0 until 8).map { f =>
        val start = f * len / 8
        val end = math.max(start + 1, (f + 1) * len / 8)
        (id, f, math.min(end, len) - start)
      }
    }.toSet
    val got = SparkEntry.queries("q_frame_sample")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(got == want)
    assert(got.groupBy(_._1).forall(_._2.size == 8), "8 frames per container")
  }

  test("decodeWavHeader round-trips wavWrap and walks real chunk lists") {
    // our own wrapper round-trips: rate/channels/bits/dataLen all real
    val w = Multimodal.wavWrap("pcm bytes here".getBytes("UTF-8"), 44100, 2)
    assert(w.length == 14 + 44)
    assert(Multimodal.decodeWavHeader(w).contains((44100, 2, 16, 14)))
    assert(Multimodal.decodeWavHeader(
      Multimodal.wavWrap(Array.emptyByteArray, 8000, 1)).contains((8000, 1, 16, 0)))
    // fmt need not be first: a LIST chunk (odd length → padded to even)
    // before fmt must be skipped, not misread
    val payload = "xyz".getBytes
    def ascii(s: String) = s.getBytes("US-ASCII")
    def le32(v: Int) = Array(v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)
    val std = Multimodal.wavWrap(payload, 22050, 1)
    val reordered = ascii("RIFF") ++ le32(std.length - 8 + 12) ++ ascii("WAVE") ++
      ascii("LIST") ++ le32(3) ++ Array[Byte](1, 2, 3, 0) ++ // odd chunk + pad byte
      std.drop(12) // fmt + data from the standard container
    assert(Multimodal.decodeWavHeader(reordered).contains((22050, 1, 16, 3)))
    // junk / truncated / PNG payloads: None, never a throw
    assert(Multimodal.decodeWavHeader("RIFFnot a wav".getBytes).isEmpty)
    assert(Multimodal.decodeWavHeader(std.take(20)).isEmpty)
    assert(Multimodal.decodeWavHeader(Multimodal.pngWrap("x".getBytes, 4, 4)).isEmpty)
    assert(Multimodal.decodeWavHeader(Array.emptyByteArray).isEmpty)
  }

  test("q_audio_meta decodes every container and is map-only") {
    val dir = "/root/testdata/sf0.001"
    val rates = Array(8000, 16000, 22050, 44100)
    val want = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).collect().map { r =>
        val id = r.getLong(0); val bytes = r.getString(1).getBytes("UTF-8").length
        val rate = rates((id % 4).toInt); val ch = 1 + (id % 2).toInt
        (id, rate, ch, 16, bytes, bytes + 44,
          bytes.toLong * 1000L / (rate.toLong * ch * 2), true)
      }.toSet
    val q = SparkEntry.queries("q_audio_meta")(spark, dir)
    val got = q.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
      r.getInt(3), r.getInt(4), r.getInt(5), r.getLong(6), r.getBoolean(7))).toSet
    assert(got == want)
    assert(q.schema == Multimodal.audioSchema)
    val plan = Multimodal.extractAudioMeta(Multimodal.withFakeAudio(
      spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text"))
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("exchange"), s"audio decode must be map-only:\n$plan")
  }

  test("decodeMp4Header round-trips mp4Wrap and walks real box trees") {
    import graft.operators.Multimodal.Mp4Meta
    val payload = "video payload bytes".getBytes("UTF-8")
    val m = Multimodal.mp4Wrap(payload, 90000, 475L, 640, 480)
    assert(m.length == payload.length + 244)
    assert(Multimodal.decodeMp4Header(m)
      .contains(Mp4Meta("isom", 90000L, 475L, 640, 480, payload.length.toLong)))
    assert(Multimodal.decodeMp4Header(
        Multimodal.mp4Wrap(Array.emptyByteArray, 600, 0L, 16, 16))
      .contains(Mp4Meta("isom", 600L, 0L, 16, 16, 0L)))
    def be32(v: Long) = Array((v >>> 24).toByte, (v >>> 16).toByte,
      (v >>> 8).toByte, v.toByte)
    def ascii(s: String) = s.getBytes("US-ASCII")
    // unknown sibling boxes (free) skip by size; an mdat with
    // size==1 + 64-bit largesize reads its payload length correctly
    val std = Multimodal.mp4Wrap(payload, 1000, 99L, 320, 240)
    val core = std.dropRight(8 + payload.length) // ftyp + moov
    val weird = core ++
      be32(16) ++ ascii("free") ++ new Array[Byte](8) ++
      be32(1) ++ ascii("mdat") ++ be32(0) ++ be32(16L + payload.length) ++ payload
    assert(Multimodal.decodeMp4Header(weird)
      .contains(Mp4Meta("isom", 1000L, 99L, 320, 240, payload.length.toLong)))
    // junk / truncated / non-BMFF payloads: None, never a throw
    assert(Multimodal.decodeMp4Header("not an mp4 at all".getBytes).isEmpty)
    assert(Multimodal.decodeMp4Header(std.take(40)).isEmpty) // moov truncated away
    assert(Multimodal.decodeMp4Header(
      Multimodal.wavWrap("x".getBytes, 8000, 1)).isEmpty)
    assert(Multimodal.decodeMp4Header(Array.emptyByteArray).isEmpty)
    // corrupt box size inside moov: parse stops, missing fields → None
    val corrupt = std.clone()
    System.arraycopy(be32(0x7fffffffL), 0, corrupt, 20, 4) // moov size overruns EOF
    assert(Multimodal.decodeMp4Header(corrupt).isEmpty)
  }

  test("q_video_meta decodes every container and is map-only") {
    val dir = "/root/testdata/sf0.001"
    val scales = Array(600, 1000, 30000, 90000)
    val want = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).collect().map { r =>
        val id = r.getLong(0); val n = r.getString(1).getBytes("UTF-8").length
        val ts = scales((id % 4).toInt)
        (id, if (id % 2 == 0L) "isom" else "mp42", ts.toLong,
          n.toLong * 25L, n.toLong * 25L * 1000L / ts,
          320 + 16 * (id % 5).toInt, 240 + 16 * (id % 3).toInt,
          n.toLong, n + 244, true)
      }.toSet
    val q = SparkEntry.queries("q_video_meta")(spark, dir)
    val got = q.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getInt(5), r.getInt(6), r.getLong(7),
      r.getInt(8), r.getBoolean(9))).toSet
    assert(got == want)
    assert(q.schema == Multimodal.videoSchema)
    val plan = Multimodal.extractVideoMeta(Multimodal.withFakeVideo(
      spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text"))
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("exchange"), s"video decode must be map-only:\n$plan")
  }

  test("q_resize_plan hits a 224 short side from the REAL decoded dims") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q_resize_plan")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getLong(3), r.getInt(4), r.getInt(5)))
    assert(got.nonEmpty && got.forall(_._1 % 2 == 0), "PNG rows only")
    got.foreach { case (id, w, h, scale, ow, oh) =>
      assert(w == 16 + (id % 640).toInt && h == 16 + (id % 480).toInt,
        s"doc $id: decoded dims drifted from the generator")
      assert(scale == 224L * 1000000L / math.min(w, h))
      assert(ow == (w * scale + 500000L) / 1000000L)
      assert(oh == (h * scale + 500000L) / 1000000L)
      // the SHORT side lands on 224 up to half-pixel rounding
      assert(math.abs(math.min(ow, oh) - 224) <= 1, s"doc $id short side ${math.min(ow, oh)}")
      // aspect preserved within a pixel of exact scaling
      assert(math.abs(ow.toDouble / oh - w.toDouble / h) <=
        1.0 / math.min(oh, h), s"doc $id aspect drift")
    }
  }
}
