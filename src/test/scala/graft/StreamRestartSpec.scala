package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.EventsStream

/** END-TO-END streaming execution with a REAL checkpoint: file source →
  * transform → file sink, driven by `Trigger.AvailableNow`, stopped and
  * RESTARTED against the same checkpoint dir. This is the part of the
  * streaming contract the MemoryStream specs cannot see: offset/commit
  * log replay, watermark persistence, and state-store restore across
  * process generations — the exactly-once story a production deployment
  * actually relies on. The parquet file sink's `_spark_metadata` commit
  * log is what makes re-run output exactly-once; the assertions read
  * the sink THROUGH Spark so the commit log is honored. */
class StreamRestartSpec extends GraftSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def freshDir(name: String): java.io.File = {
    val f = new java.io.File(s"target/stream_restart/$name")
    org.apache.commons.io.FileUtils.deleteDirectory(f)
    f.mkdirs()
    f
  }

  test("windowed agg: AvailableNow restarts resume the watermark; closed windows emit exactly once") {
    val in = freshDir("agg_in")
    val ckpt = freshDir("agg_ckpt")
    val out = freshDir("agg_out")
    val schema = "event_id LONG, ts TIMESTAMP, user_id LONG, " +
      "event_type STRING, value DOUBLE, props STRING"

    def writeBatch(n: Int, rows: Seq[(Long, Timestamp, Long, String, Double, String)]): Unit =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(s"${in.getPath}/batch_$n")

    // One generation = start → drain available files → stop. Each call is
    // a fresh StreamingQuery against the SAME checkpoint — a restart.
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet")
        .parquet(s"${in.getPath}/*")
      val q = EventsStream.hourlyStats(stream)
        .writeStream.format("parquet")
        .option("path", out.getPath)
        .option("checkpointLocation", ckpt.getPath)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def sink(): Set[(String, String, Long, Double)] =
      spark.read.schema(
          "window_start TIMESTAMP, event_type STRING, n LONG, total_value DECIMAL(28,2)")
        .parquet(out.getPath)
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1),
          r.getLong(2), r.getDecimal(3).doubleValue())).toSet

    // generation 1: two events in the 10:00 window — nothing can close
    // (the watermark trails by one batch), so the sink stays empty
    writeBatch(1, Seq(
      (1L, ts("2024-01-01 10:05:00"), 1L, "click", 2.0, "{}"),
      (2L, ts("2024-01-01 10:55:00"), 1L, "click", 3.0, "{}")))
    runOnce()
    assert(sink().isEmpty, "no window may close before the watermark passes it")

    // generation 2 (RESTART): a 15:00 event advances the watermark to
    // 13:00 (AvailableNow drains with a trailing batch that applies the
    // advanced watermark within the run), closing the 10:00 window. Its
    // emitted count n=2 comes ENTIRELY from generation-1 events — that
    // row can only be right if the restart RESTORED the window state
    // from the checkpoint (a reset would emit nothing or n=0) and
    // resumed the offset log rather than re-ingesting batch_1 (a replay
    // would double-count to n=4).
    writeBatch(2, Seq((3L, ts("2024-01-01 15:00:00"), 2L, "click", 5.0, "{}")))
    runOnce()
    assert(sink() == Set(("2024-01-01 10:00:00.0", "click", 2L, 5.0)),
      s"10:00 window must emit once, built from restored state: ${sink()}")

    // generation 3 (RESTART, no new data): the offset log knows every
    // file is committed — nothing reprocesses, nothing re-emits
    runOnce()
    assert(sink() == Set(("2024-01-01 10:00:00.0", "click", 2L, 5.0)),
      "an idle restart must not duplicate output")
  }

  test("sessionize: state store restores across restart; replays emit nothing twice") {
    val in = freshDir("sess_in")
    val ckpt = freshDir("sess_ckpt")
    val out = freshDir("sess_out")

    def writeBatch(n: Int, rows: Seq[EventsStream.Event]): Unit =
      rows.toDS().coalesce(1).write.parquet(s"${in.getPath}/batch_$n")

    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema("event_id LONG, ts TIMESTAMP, user_id LONG")
        .parquet(s"${in.getPath}/*").as[EventsStream.Event]
      val q = EventsStream.sessionize(stream, gapSeconds = 600)
        .toDF().writeStream.format("parquet")
        .option("path", out.getPath)
        .option("checkpointLocation", ckpt.getPath)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def sink(): Seq[(Long, Long, Int)] =
      spark.read.schema("event_id LONG, user_id LONG, session_id INT")
        .parquet(out.getPath)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .sortBy(_._1).toSeq

    // generation 1 ends with user 7 in SESSION 2 (10:00, then a >10-min
    // gap to 12:00) — the state a restart must restore is (count=2,
    // lastTs=12:00), not the fresh (0, −∞)
    writeBatch(1, Seq(
      EventsStream.Event(1L, ts("2024-01-01 10:00:00"), 7L),
      EventsStream.Event(2L, ts("2024-01-01 12:00:00"), 7L)))
    runOnce()
    assert(sink() == Seq((1L, 7L, 1), (2L, 7L, 2)))

    // generation 2 (RESTART): 12:04 is within the gap of 12:00 — session
    // 2 CONTINUES only if the state store came back; a lost state would
    // restart the counter and assign session 1. 14:00 then opens 3.
    writeBatch(2, Seq(
      EventsStream.Event(3L, ts("2024-01-01 12:04:00"), 7L),
      EventsStream.Event(4L, ts("2024-01-01 14:00:00"), 7L)))
    runOnce()
    assert(sink() == Seq((1L, 7L, 1), (2L, 7L, 2), (3L, 7L, 2), (4L, 7L, 3)),
      s"restart must resume session state, not reset it: ${sink()}")

    // generation 3 (RESTART, no new data): exactly-once — committed
    // batches replay as no-ops, rows 1-4 appear exactly once
    runOnce()
    assert(sink() == Seq((1L, 7L, 1), (2L, 7L, 2), (3L, 7L, 2), (4L, 7L, 3)),
      "an idle restart must not re-emit committed session rows")
  }
}
