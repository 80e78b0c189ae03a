package graft.sources

import java.io.{BufferedReader, ByteArrayInputStream, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.util.zip.ZipInputStream

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Zipped-tabular extraction → DataFrame.
  *
  * The reference downloads a zip archive and reads the first entry as an
  * XLSX into pandas (feeder.py:118-122, add_q5010.py:44-49). Spark-side:
  * the `binaryFile` source distributes whole archives to executors, and
  * each task stream-decodes its archive's first entry — ingest of 10k
  * result archives is a 10k-task map with no driver involvement.
  *
  * The CSV payload path is real. XLSX decoding needs a spreadsheet codec
  * (Apache POI), which is not in this environment — `decodeXlsx` is a
  * clearly-marked stub with the same signature, so wiring a codec in
  * changes one function.
  */
object ZippedTabular {

  /** First zip entry's bytes. */
  def firstEntry(archive: Array[Byte]): Array[Byte] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(archive))
    try {
      val e = zin.getNextEntry
      require(e != null, "empty zip archive")
      zin.readAllBytes()
    } finally zin.close()
  }

  /** Parse a headered CSV payload into (header, rows). Minimal dialect:
    * comma-separated, no quoting — enough for the reference's export
    * shape; swap in a full CSV parser the same way. */
  def parseCsv(bytes: Array[Byte]): (Array[String], Iterator[Array[String]]) = {
    val r = new BufferedReader(new InputStreamReader(
      new ByteArrayInputStream(bytes), StandardCharsets.UTF_8))
    val header = Option(r.readLine()).getOrElse("").split(",", -1)
    val rows = Iterator.continually(r.readLine()).takeWhile(_ != null)
      .map(_.split(",", -1))
    (header, rows)
  }

  /** STUB: an XLSX decode would unzip the sheet XML / hand bytes to POI.
    * Not available offline — fail loudly rather than fake spreadsheet
    * parsing. */
  def decodeXlsx(bytes: Array[Byte]): (Array[String], Iterator[Array[String]]) =
    throw new UnsupportedOperationException(
      "XLSX codec not available in this environment; see ZippedTabular.parseCsv for the wired path")

  /** Read every `*.zip` under `path` (each containing one CSV entry) into
    * a single string-typed DataFrame with the given column names.
    * Distributed: one task per archive via the binaryFile source. */
  def readZippedCsv(spark: SparkSession, path: String, columns: Seq[String]): DataFrame = {
    val schema = StructType(columns.map(StructField(_, StringType, nullable = true)))
    val bin = spark.read.format("binaryFile").load(path)
      .select(col("content"))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val n = columns.length
    bin.mapPartitions { rows =>
      rows.flatMap { r =>
        val (_, dataRows) = parseCsv(firstEntry(r.getAs[Array[Byte]](0)))
        dataRows.map(cells => Row.fromSeq(
          (0 until n).map(i => if (i < cells.length) cells(i) else null)))
      }
    }(enc)
  }
}
