package graft

/** q_binary_ingest (op 206) — media-as-files through the binaryFile
  * source with partition-local header decode. */
class BinaryIngestSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"

  test("every fixture file decodes; metadata matches the generator") {
    val got = SparkEntry.queries("q_binary_ingest")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getBoolean(4))).sortBy(_._1)
    assert(got.length == 40)
    got.foreach { case (i, nBytes, w, h, decoded) =>
      assert(decoded, s"file $i failed the IHDR decode")
      assert(nBytes == 2 * (i + 1) + 57, s"file $i size")
      assert(w == 16 + (i % 7) * 3 && h == 9 + (i % 5) * 2, s"file $i dims")
    }
    // idempotent across invocations (fixture reuse, not rebuild)
    val again = SparkEntry.queries("q_binary_ingest")(spark, dir).collect()
    assert(again.length == 40)
  }
}
