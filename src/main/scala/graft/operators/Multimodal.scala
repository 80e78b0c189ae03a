package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: media payloads ride through the pipeline
  * as opaque `binary` columns plus typed metadata, and per-item decode /
  * feature-extraction runs as a partition-local imperative pass
  * (`mapPartitions`) — the one place imperative code is the right tool,
  * because codec libraries are per-buffer black boxes.
  *
  * The actual image/audio codecs are NOT available in this environment,
  * so `decodeStub` below is a clearly-marked deterministic fake; the
  * Spark-side contract — schema, batch iteration shape, partitioning,
  * output schema — is real and tested. Swapping in a real codec changes
  * only the function body.
  *
  * Scale notes: binary payloads never pass through a shuffle here (decode
  * is map-only); feature rows are the only thing downstream aggregations
  * shuffle. `spark.sql.files.maxPartitionBytes` governs scan parallelism
  * for large media files.
  */
object Multimodal {

  /** Output schema of the feature extractor. */
  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("checksum", LongType, nullable = false),
  ))

  /** Attach a deterministic binary payload derived from the text column —
    * stands in for a real media column when building/testing plumbing. */
  def withFakeMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
      encode(col(textCol), "UTF-8").as("media"),
      when(col(idCol) % 2 === 0, "image/png").otherwise("audio/wav").as("media_type"))

  /** STUB decode: a real implementation would hand `bytes` to an image /
    * audio codec. This fake derives stable pseudo-dimensions + a checksum
    * from the payload so tests are deterministic. */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Long) = {
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    val w = 16 + math.floorMod(h, 640).toInt
    val ht = 16 + math.floorMod(h >> 16, 480).toInt
    (w, ht, h)
  }

  /** Output schema of the resize stage. */
  val resizedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
  ))

  /** STUB resize: a real implementation hands bytes to an image codec and
    * scales; the fake derives a deterministic payload of the target size
    * so partitioning/schema plumbing is real and testable. */
  def resizeStub(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte]((w.toLong * h % 4096).toInt + 16)
    var i = 0
    while (i < out.length) { out(i) = bytes(i % math.max(bytes.length, 1)); i += 1 }
    out
  }

  /** Batch resize: map-only pass producing fixed-dimension payloads. */
  def resizeAll(media: DataFrame, w: Int, h: Int): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(resizedSchema)
    media.select(col("doc_id").cast("long"), col("media"))
      .mapPartitions { rows =>
        rows.map { r =>
          Row(r.getLong(0), resizeStub(r.getAs[Array[Byte]](1), w, h), w, h)
        }
      }(enc)
  }

  /** Output schema of frame sampling: one row per sampled frame. */
  val frameSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("frame", BinaryType, nullable = false),
  ))

  /** STUB frame-sample: a real implementation seeks the container and
    * decodes every `stride`-th frame; the fake slices the payload
    * deterministically. Map-only; output explodes 1→n rows per video but
    * never shuffles the source bytes. */
  def sampleFrames(media: DataFrame, nFrames: Int): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(frameSchema)
    media.select(col("doc_id").cast("long"), col("media"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val bytes = r.getAs[Array[Byte]](1)
          val id = r.getLong(0)
          (0 until nFrames).iterator.map { f =>
            val start = if (bytes.isEmpty) 0 else (f * bytes.length / nFrames)
            val end = if (bytes.isEmpty) 0 else math.max(start + 1, ((f + 1) * bytes.length / nFrames))
            Row(id, f, java.util.Arrays.copyOfRange(bytes, start, math.min(end, bytes.length)))
          }
        }
      }(enc)
  }

  /** Partition-local feature extraction over (id, media, media_type). */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val enc = org.apache.spark.sql.Encoders.row(featureSchema)
    media.select(col("doc_id").cast("long"), col("media"), col("media_type"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val mt = r.getString(2)
          val (w, h, ck) = decodeStub(bytes)
          Row(id, mt, bytes.length, w, h, ck)
        }
      }(enc)
  }
}
