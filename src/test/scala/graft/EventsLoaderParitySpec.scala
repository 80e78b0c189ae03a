package graft

import org.apache.spark.sql.functions._

/** The adaptive events loader must yield IDENTICAL rows whatever the
  * parquet encoding of `ts` — the guarantee that survived round 6's
  * testdata regeneration is pinned here for both directions. */
class EventsLoaderParitySpec extends GraftSuite {
  import spark.implicits._

  test("timestamp[us] and legacy ns-as-long encodings load identically") {
    val rows = Seq(
      (1L, 0L, 7L, "a", 1.5, "{}"),
      (2L, 1_700_000_123_456L * 1000L, 7L, "b", 2.5, "{}"),
      (3L, 999L, 8L, "a", 0.0, "{}"), // sub-µs ns remainder truncates
      (4L, 86_400_000_000_000L, 9L, "c", -1.0, "{}"))
    val usDir = java.nio.file.Files.createTempDirectory("graft_ev_us").toString
    val nsDir = java.nio.file.Files.createTempDirectory("graft_ev_ns").toString
    // µs encoding: what the driver ships today (naive timestamp[us])
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000"))
        .cast("timestamp_ntz"))
      .write.parquet(s"$usDir/events.parquet")
    // legacy encoding: raw long nanos (what rounds 1-5 shipped, as the
    // loader's LongType branch sees it)
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$nsDir/events.parquet")
    def load(dir: String) = SparkEntry.queries("q_events_window")(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    assert(load(usDir) == load(nsDir),
      "the two encodings must be indistinguishable downstream")
    // and a direct probe of the normalized column itself
    def ts(dir: String) = eventsTable(dir)
      .select(col("event_id"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(ts(usDir) == ts(nsDir))
    assert(ts(usDir).map(_._2) ==
      rows.sortBy(_._1).map(_._2 / 1000L), "µs values must be ns DIV 1000")
    Seq(usDir, nsDir).foreach(d =>
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
  }

  test("a REAL TIMESTAMP(NANOS) parquet file loads identically (footer probe)") {
    // Spark 4 cannot WRITE ns-precision parquet, so this fixture is
    // authored through parquet-hadoop's Group API directly — the first
    // real-file exercise of the legacy loader branch (previously pinned
    // only via the raw-long proxy above). The loader must (a) detect the
    // NANOS annotation from the FOOTER — no exception-message matching —
    // (b) read under nanosAsLong, and (c) truncate ns→µs identically to
    // the other encodings.
    import org.apache.parquet.schema.{Types, LogicalTypeAnnotation => LTA}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.util.HadoopOutputFile
    val rows = Seq(
      (1L, 0L, 7L, "a", 1.5, "{}"),
      (2L, 1_700_000_123_456L * 1000L + 999L, 7L, "b", 2.5, "{}"),
      (3L, 999L, 8L, "a", 0.0, "{}"),
      (4L, 86_400_000_000_000L, 9L, "c", -1.0, "{}"))
    val usDir = java.nio.file.Files.createTempDirectory("graft_ev_us2").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000"))
        .cast("timestamp_ntz"))
      .write.parquet(s"$usDir/events.parquet")
    val nsDir = java.nio.file.Files.createTempDirectory("graft_ev_truens").toString
    val schema = Types.buildMessage()
      .addField(Types.required(INT64).named("event_id"))
      .addField(Types.required(INT64)
        .as(LTA.timestampType(false, LTA.TimeUnit.NANOS)).named("ts"))
      .addField(Types.required(INT64).named("user_id"))
      .addField(Types.required(BINARY).as(LTA.stringType()).named("event_type"))
      .addField(Types.required(DOUBLE).named("value"))
      .addField(Types.required(BINARY).as(LTA.stringType()).named("props"))
      .named("events")
    val hconf = spark.sparkContext.hadoopConfiguration
    val part = new org.apache.hadoop.fs.Path(
      s"$nsDir/events.parquet/part-00000.parquet")
    val writer = ExampleParquetWriter
      .builder(HadoopOutputFile.fromPath(part, hconf))
      .withType(schema).build()
    val gf = new SimpleGroupFactory(schema)
    rows.foreach { case (id, ns, uid, et, v, pr) =>
      val g = gf.newGroup()
      g.add("event_id", id); g.add("ts", ns); g.add("user_id", uid)
      g.add("event_type", et); g.add("value", v); g.add("props", pr)
      writer.write(g)
    }
    writer.close()
    def ts(dir: String) = eventsTable(dir)
      .select(col("event_id"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(ts(nsDir) == ts(usDir),
      "true-NANOS files must load identically to the µs encoding")
    assert(ts(nsDir).map(_._2) == rows.sortBy(_._1).map(_._2 / 1000L),
      "ns values must truncate to µs by integer division")
    val win = SparkEntry.queries("q_events_window")(spark, nsDir)
      .collect().map(_.toString).sorted.toSeq
    val winUs = SparkEntry.queries("q_events_window")(spark, usDir)
      .collect().map(_.toString).sorted.toSeq
    assert(win == winUs, "downstream queries agree across encodings")
    Seq(usDir, nsDir).foreach(d =>
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
  }
}
