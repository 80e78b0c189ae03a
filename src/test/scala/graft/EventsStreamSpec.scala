package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventsStream

class EventsStreamSpec extends GraftSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("hourlyStats batch form aggregates per tumbling hour") {
    val events = Seq(
      (1L, ts("2024-01-01 10:05:00"), 1L, "click", 2.0, "{}"),
      (2L, ts("2024-01-01 10:55:00"), 1L, "click", 3.0, "{}"),
      (3L, ts("2024-01-01 11:05:00"), 2L, "click", 5.0, "{}"),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventsStream.hourlyStats(events).orderBy("window_start").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("n") == 2)
    assert(out(0).getAs[java.math.BigDecimal]("total_value").doubleValue() == 5.0)
  }

  test("sessionize over a MemoryStream assigns gap-based session ids") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventsStream.Event]
    val sessions = EventsStream.sessionize(input.toDS(), gapSeconds = 600)
    val q = sessions.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      input.addData(
        EventsStream.Event(1L, ts("2024-01-01 10:00:00"), 7L),
        EventsStream.Event(2L, ts("2024-01-01 10:05:00"), 7L), // same session
        EventsStream.Event(3L, ts("2024-01-01 11:00:00"), 7L), // gap > 10min → new
        EventsStream.Event(4L, ts("2024-01-01 10:00:00"), 8L), // other user
      )
      q.processAllAvailable()
      val out = spark.table("sess_out").orderBy("event_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      assert(out.toSeq == Seq((1L, 7L, 1), (2L, 7L, 1), (3L, 7L, 2), (4L, 8L, 1)))
    } finally q.stop()
  }

  test("native session_window runs as a real stream: watermark closes sessions, append emits them") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val input = MemoryStream[(Long, Timestamp, Long)]
    val sessions = input.toDF().toDF("event_id", "ts", "user_id")
      .withWatermark("ts", "1 minute")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("session_start"), col("n_events"))
    val q = sessions.writeStream.format("memory").queryName("native_sess")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, ts("2024-01-01 10:00:00"), 7L),
        (2L, ts("2024-01-01 10:10:00"), 7L), // merges: within 30 min
        (3L, ts("2024-01-01 10:00:00"), 8L))
      q.processAllAvailable()
      // advance event time far past the sessions + watermark → they close
      input.addData((4L, ts("2024-01-01 13:00:00"), 9L))
      q.processAllAvailable()
      val out = spark.table("native_sess")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
      assert(out == Set(
        (7L, ts("2024-01-01 10:00:00"), 2L),  // one merged 2-event session
        (8L, ts("2024-01-01 10:00:00"), 1L)),
        s"closed sessions wrong: $out")
      // user 9's session is still open (nothing after it advanced the watermark)
      assert(!out.exists(_._1 == 9L), "an open session must not emit in append mode")
    } finally q.stop()
  }

  test("StateMaintainer folds micro-batches into the incremental-agg state") {
    import graft.operators.{IncrementalAgg, QuantileSketch}
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Double)]
    val m = new EventsStream.StateMaintainer(
      IncrementalAgg.state(_, "user_id", "value"),
      IncrementalAgg.merge("user_id", _, _))
    val q = m.attach(input.toDF().toDF("user_id", "value")).start()
    try {
      // three micro-batches, overlapping keys
      input.addData((1L, 10.0), (2L, 5.0)); q.processAllAvailable()
      input.addData((1L, 2.5)); q.processAllAvailable()
      input.addData((3L, 1.0), (1L, 0.5)); q.processAllAvailable()
      val got = m.current.get.orderBy("user_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2).doubleValue))
      // merged state ≡ the state over the concatenation of every batch
      assert(got.toSeq == Seq((1L, 3L, 13.0), (2L, 1L, 5.0), (3L, 1L, 1.0)))
    } finally q.stop()
    // the same maintainer shape drives the quantile sketch — merged
    // stream state equals the batch state over all rows
    val input2 = MemoryStream[(Long, Double)]
    val qs = new EventsStream.StateMaintainer(
      QuantileSketch.state(_, "user_id", "value"),
      QuantileSketch.merge("user_id", _, _))
    val q2 = qs.attach(input2.toDF().toDF("user_id", "value")).start()
    try {
      input2.addData((1L, 1.0), (1L, 100.0)); q2.processAllAvailable()
      input2.addData((1L, 100.5), (2L, 7.0)); q2.processAllAvailable()
      import spark.implicits._
      val whole = QuantileSketch.state(
        Seq((1L, 1.0), (1L, 100.0), (1L, 100.5), (2L, 7.0)).toDF("user_id", "value"),
        "user_id", "value")
      val a = qs.current.get.orderBy("user_id", "bucket").collect().map(_.toString)
      val b = whole.orderBy("user_id", "bucket").collect().map(_.toString)
      assert(a.toSeq == b.toSeq)
    } finally q2.stop()
  }

  test("firstTouch batch form keeps the earliest event per (user, type)") {
    val events = Seq(
      (5L, ts("2024-01-01 10:30:00"), 7L, "click", 1.0, "{}"),
      (2L, ts("2024-01-01 10:00:00"), 7L, "click", 1.0, "{}"), // earliest → kept
      (3L, ts("2024-01-01 10:00:00"), 7L, "click", 1.0, "{}"), // ts tie → higher id loses
      (4L, ts("2024-01-01 09:00:00"), 7L, "view", 1.0, "{}"),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventsStream.firstTouch(events).orderBy("event_type")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq((7L, "click", 2L), (7L, "view", 4L)))
  }

  test("streaming dedup parity: dropDuplicatesWithinWatermark keeps firstTouch's rows on an in-order feed") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Long, String)]
    val events = input.toDF().toDF("event_id", "ts", "user_id", "event_type")
    val q = events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("user_id", "event_type")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    val feed = Seq(
      (2L, ts("2024-01-01 10:00:00"), 7L, "click"),
      (3L, ts("2024-01-01 10:10:00"), 7L, "click"), // dup key → dropped
      (4L, ts("2024-01-01 10:20:00"), 7L, "view"),
      (5L, ts("2024-01-01 10:30:00"), 7L, "click"), // still within state → dropped
    )
    try {
      feed.foreach { e => input.addData(e); q.processAllAvailable() }
      val streamed = spark.table("dedup_out")
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3))).toSet
      val batch = EventsStream.firstTouch(
          feed.toDF("event_id", "ts", "user_id", "event_type").withColumn("value", lit(0.0)))
        .collect().map(r => (r.getLong(2), r.getLong(0), r.getString(1))).toSet
      assert(streamed == batch,
        s"stream kept $streamed but batch firstTouch kept $batch")
    } finally q.stop()
  }

  test("hourlyStats runs as a real stream: watermark drops late data, windows emit on advance") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val events = input.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = graft.streaming.EventsStream.hourlyStats(events)
      .writeStream.format("memory").queryName("hourly_out")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, ts("2024-01-01 10:05:00"), 1L, "click", 2.0, "{}"),
        (2L, ts("2024-01-01 10:55:00"), 1L, "click", 3.0, "{}"))
      q.processAllAvailable()
      // advance the watermark far past the 10:00 window (2h watermark)
      input.addData((3L, ts("2024-01-01 14:00:00"), 2L, "click", 5.0, "{}"))
      q.processAllAvailable()
      // late event for the already-closed 10:00 window → dropped
      input.addData((4L, ts("2024-01-01 10:10:00"), 3L, "click", 100.0, "{}"))
      input.addData((5L, ts("2024-01-01 15:00:00"), 2L, "click", 1.0, "{}"))
      q.processAllAvailable()
      val out = spark.table("hourly_out")
        .collect().map(r => (r.getTimestamp(0).toString, r.getLong(2),
          r.getDecimal(3).doubleValue())).toSet
      // the 10:00 window emitted once with the two on-time events only
      assert(out.contains(("2024-01-01 10:00:00.0", 2L, 5.0)))
      assert(!out.exists(_._3 == 105.0), "late event must not reopen the window")
    } finally q.stop()
  }

  test("file-source streaming parity: readStream over the events parquet matches batch") {
    val dir = "/root/testdata/sf0.001"
    // the file-stream source needs a DIRECTORY of files
    val streamDir = new java.io.File("target/stream_events")
    streamDir.mkdirs()
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      java.nio.file.Paths.get(s"${streamDir.getPath}/events.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    def fix(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("ts", col("ts").cast("timestamp"))
    val stream = fix(spark.readStream.schema(schema).parquet(streamDir.getPath))
    val q = graft.streaming.EventsStream.hourlyStats(stream)
      .writeStream.format("memory").queryName("file_stream_out")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("file_stream_out")
        .collect().map(_.toString).sorted
      val batch = graft.streaming.EventsStream
        .hourlyStats(fix(spark.read.parquet(s"$dir/events.parquet")))
        .collect().map(_.toString).sorted
      assert(streamed.nonEmpty)
      assert(streamed.toSeq == batch.toSeq, "stream and batch results must agree")
    } finally q.stop()
  }

  test("streaming exact dedup: dropDuplicates with watermark drops replays") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, Timestamp)]
    val deduped = input.toDF().toDF("event_id", "ts")
      .withWatermark("ts", "1 hour")
      .dropDuplicates("event_id")
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      input.addData((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 10:01:00")))
      q.processAllAvailable()
      input.addData((1L, ts("2024-01-01 10:02:00")), (3L, ts("2024-01-01 10:03:00")))
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("event_id")
        .collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L), "replayed event_id must appear once")
    } finally q.stop()
  }

  test("stream-static join: a streaming fact enriches against a static dim") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val input = MemoryStream[(Long, Long, Double)]
    val enriched = input.toDF().toDF("event_id", "user_id", "value")
      .join(broadcast(dim), Seq("user_id"), "left")
    val q = enriched.writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    try {
      input.addData((10L, 1L, 5.0), (11L, 2L, 7.0), (12L, 99L, 1.0))
      q.processAllAvailable()
      val out = spark.table("enrich_out").orderBy("event_id")
        .collect().map(r => (r.getLong(1), Option(r.getString(3)).getOrElse("-")))
      assert(out.toSeq == Seq((10L, "gold"), (11L, "basic"), (12L, "-")))
    } finally q.stop()
  }

  test("stream-stream interval join: views attribute to purchases within the band") {
    implicit val sqlCtx = spark.sqlContext
    val vIn = MemoryStream[(Long, Timestamp, Long)]
    val pIn = MemoryStream[(Long, Timestamp, Long)]
    val views = vIn.toDF().toDF("event_id", "ts", "user_id")
      .withWatermark("ts", "1 hour")
    val purchases = pIn.toDF().toDF("event_id", "ts", "user_id")
      .withWatermark("ts", "1 hour")
    val q = EventsStream.viewsBeforePurchase(purchases, views)
      .writeStream.format("memory").queryName("attr_out")
      .outputMode("append").start()
    try {
      vIn.addData(
        (100L, ts("2024-01-01 09:40:00"), 7L), // inside the 30-min band
        (101L, ts("2024-01-01 09:00:00"), 7L), // too early
        (102L, ts("2024-01-01 09:50:00"), 8L), // other user
        (103L, ts("2024-01-01 09:30:00"), 7L), // exactly band start: included
        (104L, ts("2024-01-01 10:00:00"), 7L)) // at purchase ts: excluded
      pIn.addData((200L, ts("2024-01-01 10:00:00"), 7L))
      q.processAllAvailable()
      val out = spark.table("attr_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(out == Set((200L, 7L, 100L), (200L, 7L, 103L)))
      // batch parity: the SAME function over batch frames, same rows
      val bv = Seq((100L, ts("2024-01-01 09:40:00"), 7L),
        (101L, ts("2024-01-01 09:00:00"), 7L),
        (102L, ts("2024-01-01 09:50:00"), 8L),
        (103L, ts("2024-01-01 09:30:00"), 7L),
        (104L, ts("2024-01-01 10:00:00"), 7L)).toDF("event_id", "ts", "user_id")
      val bp = Seq((200L, ts("2024-01-01 10:00:00"), 7L))
        .toDF("event_id", "ts", "user_id")
      val batch = EventsStream.viewsBeforePurchase(bp, bv).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(batch == out)
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER interval join emits unmatched purchases once the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val vIn = MemoryStream[(Long, Timestamp, Long)]
    val pIn = MemoryStream[(Long, Timestamp, Long)]
    val views = vIn.toDF().toDF("view_id", "vts", "v_user")
      .withWatermark("vts", "10 minutes")
    val purchases = pIn.toDF().toDF("purchase_id", "pts", "p_user")
      .withWatermark("pts", "10 minutes")
    val joined = purchases.join(views,
      col("p_user") === col("v_user") &&
        col("vts") >= col("pts") - expr("INTERVAL 30 MINUTES") &&
        col("vts") < col("pts"),
      "left_outer")
      .select(col("purchase_id"), col("view_id"))
    val q = joined.writeStream.format("memory").queryName("louter_out")
      .outputMode("append").start()
    try {
      // a purchase with NO views in band, and one with a matching view
      pIn.addData((200L, ts("2024-01-01 10:00:00"), 9L),
        (201L, ts("2024-01-01 10:00:00"), 7L))
      vIn.addData((100L, ts("2024-01-01 09:45:00"), 7L))
      q.processAllAvailable()
      // push both watermarks far past the band, then one more batch so
      // the state store evicts and emits the null-padded outer row
      pIn.addData((299L, ts("2024-01-01 13:00:00"), 1L))
      vIn.addData((199L, ts("2024-01-01 13:00:00"), 1L))
      q.processAllAvailable()
      pIn.addData((298L, ts("2024-01-01 14:00:00"), 1L))
      vIn.addData((198L, ts("2024-01-01 14:00:00"), 1L))
      q.processAllAvailable()
      val out = spark.table("louter_out").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      assert(out.contains((201L, 100L)), s"matched pair missing: $out")
      assert(out.contains((200L, -1L)),
        s"unmatched purchase must emit null-padded after watermark: $out")
    } finally q.stop()
  }

  test("foreachBatch upsert sink: each micro-batch merges into the base (streaming feeder shape)") {
    implicit val sqlCtx = spark.sqlContext
    // the reference's batch loop (fetch page → upsert) as a stream: each
    // micro-batch applies Upsert.update against the running base table —
    // the exact shape a JDBC/Delta sink gets in production
    var base = Seq((1L, 10.0), (2L, 20.0)).toDF("id", "bal")
    val input = MemoryStream[(Long, Double)]
    val q = input.toDF().toDF("id", "bal")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        // persist + count PINS the merged result inside the batch scope —
        // the micro-batch Dataset must not be referenced by a lazy plan
        // after its batch completes (a real sink would write it out here)
        val prev = base
        base = graft.operators.Upsert.update(base, batch, "id", Seq("bal")).persist()
        base.count()
        prev.unpersist()
        ()
      }
      .start()
    try {
      input.addData((2L, 99.0))
      q.processAllAvailable()
      input.addData((1L, 55.0), (7L, 70.0)) // unmatched id dropped by UPDATE semantics
      q.processAllAvailable()
      val out = base.orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(out.toSeq == Seq((1L, 55.0), (2L, 99.0)))
    } finally q.stop()
  }

  test("stream continuation: state persists across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventsStream.Event]
    val sessions = EventsStream.sessionize(input.toDS(), gapSeconds = 600)
    val q = sessions.writeStream.format("memory").queryName("sess_out2")
      .outputMode("append").start()
    try {
      input.addData(EventsStream.Event(1L, ts("2024-01-01 10:00:00"), 7L))
      q.processAllAvailable()
      input.addData(EventsStream.Event(2L, ts("2024-01-01 10:04:00"), 7L))
      input.addData(EventsStream.Event(3L, ts("2024-01-01 12:00:00"), 7L))
      q.processAllAvailable()
      val out = spark.table("sess_out2").orderBy("event_id")
        .collect().map(r => r.getInt(2))
      assert(out.toSeq == Seq(1, 1, 2))
    } finally q.stop()
  }

  test("RocksDB state store: session state survives a query RESTART from the checkpoint") {
    // the state backend a real deployment runs (local SST files +
    // checkpoint uploads, state size off-heap and disk-bounded instead
    // of executor-heap-bounded) — config flip + restart-resume proof
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_rocksdb_ckpt").toFile
    // memory sinks can't recover from a checkpoint — a restartable
    // query needs a replayable sink (parquet), like a real deployment
    val outDir = java.nio.file.Files.createTempDirectory("graft_rocksdb_out").toFile
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventsStream.Event]
    def start() =
      EventsStream.sessionize(input.toDS(), gapSeconds = 600)
        .writeStream.format("parquet")
        .option("path", outDir.getAbsolutePath)
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .outputMode("append").start()
    val q1 = start()
    try {
      input.addData(EventsStream.Event(1L, ts("2024-01-01 10:00:00"), 7L))
      q1.processAllAvailable()
    } finally q1.stop()
    // restart from the same checkpoint: the session COUNTER for user 7
    // lives only in the state store — a fresh store would reopen at
    // session 1, a resumed one continues to session 2
    val q2 = start()
    try {
      input.addData(
        EventsStream.Event(2L, ts("2024-01-01 12:00:00"), 7L), // past the gap
        EventsStream.Event(3L, ts("2024-01-01 12:05:00"), 7L)) // same new session
      q2.processAllAvailable()
      val out = spark.read.parquet(outDir.getAbsolutePath)
        .filter(col("event_id") >= 2L).orderBy("event_id")
        .collect().map(r => (r.getLong(0), r.getInt(2)))
      assert(out.toSeq == Seq((2L, 2), (3L, 2)),
        s"state did not resume across restart (fresh state would re-open session 1): ${out.toSeq}")
      // and the files on disk are RocksDB's, not the default HDFS-backed
      // store's .delta log
      val stateFiles = {
        def walk(f: java.io.File): Iterator[java.io.File] =
          if (f.isDirectory)
            Option(f.listFiles()).getOrElse(Array.empty).iterator.flatMap(walk)
          else Iterator(f)
        walk(new java.io.File(ckpt, "state")).map(_.getName).toVector
      }
      assert(stateFiles.exists(n => n.endsWith(".zip") || n.endsWith(".sst") ||
        n.endsWith(".changelog")),
        s"no RocksDB artifacts under the checkpoint state dir: $stateFiles")
      assert(!stateFiles.exists(_.endsWith(".delta")),
        "HDFS-backed .delta files present — RocksDB provider did not engage")
    } finally {
      q2.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("RocksDB state store: a MID-BATCH task failure replays exactly-once on restart") {
    // the r11 spec proved the CLEAN restart path (stop → resume); a real
    // deployment's failure is a task crash halfway through a micro-batch
    // — offsets logged, some task output possibly spilled, commit log
    // NOT written. Inject exactly that: a poison record that throws
    // inside the batch's map phase, killing the query mid-batch; then
    // restart from the same checkpoint with the poison disarmed and
    // assert the replayed batch lands EXACTLY ONCE (no duplicates from
    // the failed attempt, no lost records, session state continuous).
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_rocksdb_crash_ckpt").toFile
    val outDir = java.nio.file.Files.createTempDirectory("graft_rocksdb_crash_out").toFile
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventsStream.Event]
    import EventsStreamSpec.poisonArmed
    def start() = {
      val src = input.toDS().map { e =>
        if (poisonArmed.get() && e.event_id == 2L)
          throw new RuntimeException("injected mid-batch task failure")
        e
      }(org.apache.spark.sql.Encoders.product[EventsStream.Event])
      EventsStream.sessionize(src, gapSeconds = 600)
        .writeStream.format("parquet")
        .option("path", outDir.getAbsolutePath)
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .outputMode("append").start()
    }
    poisonArmed.set(false)
    val q1 = start()
    try {
      input.addData(EventsStream.Event(1L, ts("2024-01-01 10:00:00"), 7L))
      q1.processAllAvailable()
      // arm the poison: the next batch dies INSIDE task execution, after
      // the offset log records it but before the commit log does
      poisonArmed.set(true)
      input.addData(
        EventsStream.Event(2L, ts("2024-01-01 12:00:00"), 7L), // past the gap
        EventsStream.Event(3L, ts("2024-01-01 12:05:00"), 7L))
      val ex = intercept[Exception] { q1.processAllAvailable() }
      def mentionsPoison(t: Throwable): Boolean =
        t != null && (Option(t.getMessage).exists(_.contains("injected mid-batch")) ||
          mentionsPoison(t.getCause))
      assert(mentionsPoison(ex), s"query died for the wrong reason: ${ex.getMessage}")
      assert(q1.exception.isDefined, "query should have terminated with the injection")
    } finally {
      try q1.stop() catch { case _: Exception => () }
    }
    // crash evidence: the failed batch is in the OFFSET log but not the
    // COMMIT log — the restart must re-run it, not skip it
    def logBatches(name: String): Set[String] =
      Option(new java.io.File(ckpt, name).list()).getOrElse(Array.empty)
        .filterNot(_.contains(".")).toSet
    assert((logBatches("offsets") -- logBatches("commits")).nonEmpty,
      "failure was not mid-batch: offset and commit logs agree")
    // restart with the poison disarmed: Spark replays the uncommitted
    // batch from the checkpoint
    poisonArmed.set(false)
    val q2 = start()
    try {
      q2.processAllAvailable()
      // the _spark_metadata-aware read sees ONLY committed files — any
      // orphan output of the failed attempt is invisible, so each event
      // lands exactly once with the session counter resumed from state
      val out = spark.read.parquet(outDir.getAbsolutePath)
        .collect().map(r => (r.getLong(0), r.getInt(2))).sorted
      assert(out.toSeq == Seq((1L, 1), (2L, 2), (3L, 2)),
        s"replay after mid-batch failure is not exactly-once: ${out.toSeq}")
    } finally {
      q2.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState sessionizer matches flatMapGroupsWithState batch over batch") {
    // transformWithState needs the RocksDB state store provider
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventsStream.Event]
    val sessions = EventsStream.sessionizeTws(input.toDS(), gapSeconds = 600)
    val q = sessions.writeStream.format("memory").queryName("sess_tws")
      .outputMode("append").start()
    try {
      // batch 1: two users interleaved
      input.addData(
        EventsStream.Event(1L, ts("2024-01-01 10:00:00"), 7L),
        EventsStream.Event(2L, ts("2024-01-01 10:05:00"), 7L),
        EventsStream.Event(4L, ts("2024-01-01 10:00:00"), 8L))
      q.processAllAvailable()
      // batch 2: state must survive the micro-batch boundary — event 5
      // continues user 7's session, event 6 opens a new one after the gap
      input.addData(
        EventsStream.Event(5L, ts("2024-01-01 10:09:00"), 7L),
        EventsStream.Event(6L, ts("2024-01-01 12:00:00"), 8L))
      q.processAllAvailable()
      val out = spark.table("sess_tws").orderBy("event_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      assert(out.toSeq == Seq(
        (1L, 7L, 1), (2L, 7L, 1), (4L, 8L, 1), (5L, 7L, 1), (6L, 8L, 2)),
        s"tws session ids diverge: ${out.toSeq}")
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}

/** JVM-static poison switch for the mid-batch failure-injection test:
  * executors in local mode share this object, so arming it fails tasks
  * without serializing test state into the stream plan. */
object EventsStreamSpec {
  val poisonArmed = new java.util.concurrent.atomic.AtomicBoolean(false)
}
