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
}
