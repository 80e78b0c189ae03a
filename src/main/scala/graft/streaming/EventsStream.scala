package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Structured-Streaming surface over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * Both transforms are written against plain DataFrames so the SAME code
  * runs in batch (oracle-checkable, see `q_events_window`) and streaming
  * (`readStream` input + watermark). That batch/stream parity is the
  * Structured Streaming contract — one logical plan, two execution modes.
  */
object EventsStream {

  /** Tumbling hourly aggregate. In streaming mode the 2h watermark bounds
    * state; in batch mode the watermark is a no-op and the result is the
    * exact grouped aggregate. */
  def hourlyStats(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Ingest dedup: keep the EARLIEST event per natural key — the
    * exactly-once guard in front of an at-least-once feed. Batch form
    * (this, oracle-checked as `q_stream_dedup`): one map-side-combinable
    * `min_by` aggregate, no window. Streaming form:
    * `withWatermark("ts", …).dropDuplicatesWithinWatermark(keys…)`,
    * which keeps the first ARRIVAL and expires key state past the
    * watermark — identical to this batch result when the feed is in
    * event-time order (see EventsStreamSpec). */
  def firstTouch(events: DataFrame): DataFrame =
    events
      .groupBy("user_id", "event_type")
      .agg(min_by(struct(col("event_id"), col("ts")),
        struct(col("ts"), col("event_id"))).as("__f"))
      .select(col("user_id"), col("event_type"),
        col("__f.event_id").as("first_event_id"), col("__f.ts").as("first_ts"))

  /** Micro-batch maintenance of an ALGEBRAIC aggregate state — the
    * streaming form of the incremental family (IncrementalAgg count/sum
    * states, QuantileSketch histograms): each micro-batch reduces to its
    * partial state and merges into the running state inside
    * `foreachBatch`, so a 100-TB aggregate stays current without ever
    * rescanning history. The running state is `localCheckpoint`ed per
    * batch — lineage stays O(1) across an unbounded stream instead of
    * growing one merge layer per micro-batch (the same discipline as
    * ConnectedComponents' iteration). Pair with a durable sink for the
    * state (e.g. WriteLayout per merge epoch) for restart recovery;
    * exactly-once then comes from the sink's idempotent overwrite keyed
    * by `batchId`.
    *
    * @param stateOf     reduce one batch to its partial state
    * @param mergeStates fold a new partial into the running state —
    *                    MUST be the matching algebraic merge
    */
  final class StateMaintainer(stateOf: DataFrame => DataFrame,
                              mergeStates: (DataFrame, DataFrame) => DataFrame)
      extends Serializable {
    private val ref = new java.util.concurrent.atomic.AtomicReference[DataFrame]()

    /** The current merged state (None before the first batch). */
    def current: Option[DataFrame] = Option(ref.get)

    /** Fold one (micro-)batch into the running state. Synchronized: two
      * streams attached to one maintainer deliver batches on separate
      * query threads, and an unsynchronized read-merge-set would drop
      * one batch's contribution (lost update). */
    def absorb(batch: DataFrame): Unit = synchronized {
      val part = stateOf(batch)
      val merged = current.map(mergeStates(_, part)).getOrElse(part)
      ref.set(merged.localCheckpoint(true))
    }

    /** Attach to a stream: every micro-batch is absorbed as it arrives. */
    def attach(stream: DataFrame): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
      stream.writeStream.outputMode("append")
        .foreachBatch((b: Dataset[org.apache.spark.sql.Row], _: Long) => absorb(b.toDF()))
  }

  /** Stream-stream interval join: views attributed to the purchase they
    * precede within 30 minutes, per user. Written against plain
    * DataFrames — batch mode (oracle-checked as the join inside
    * `q_stream_join`) and streaming mode run the SAME plan; in
    * streaming, the caller's `withWatermark` on BOTH inputs plus this
    * time band lets Spark expire join state (views older than the
    * band, purchases past the watermark) instead of buffering the
    * streams forever. Inner form — the streaming-supported shape;
    * the batch query wraps it with the left-outer zero-count variant. */
  def viewsBeforePurchase(purchases: DataFrame, views: DataFrame): DataFrame =
    purchases.as("p").join(views.as("v"),
      col("p.user_id") === col("v.user_id") &&
        col("v.ts") >= col("p.ts") - expr("INTERVAL 30 MINUTES") &&
        col("v.ts") < col("p.ts"))
      .select(col("p.event_id").as("purchase_id"),
        col("p.user_id").as("user_id"),
        col("v.event_id").as("view_id"))

  case class Event(event_id: Long, ts: Timestamp, user_id: Long)
  case class SessionState(sessionCount: Int, lastTs: Long)
  case class SessionAssignment(event_id: Long, user_id: Long, session_id: Int)

  /** Streaming sessionization: per-user session ids with a gap timeout,
    * via flatMapGroupsWithState. The batch-parity equivalent (window
    * lag-gap cumulative sum) is `q_sessionize`; this is the stateful
    * streaming form of the same semantics for in-order event streams. */
  def sessionize(events: Dataset[Event], gapSeconds: Long): Dataset[SessionAssignment] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionAssignment](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, evs: Iterator[Event], state: GroupState[SessionState]) =>
          // sentinel lastTs: never subtract from it (t - Long.MinValue overflows)
          var s = state.getOption.getOrElse(SessionState(0, Long.MinValue))
          val out = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).map { e =>
            val t = e.ts.getTime / 1000
            s = if (s.lastTs == Long.MinValue || t - s.lastTs > gapSeconds)
                  SessionState(s.sessionCount + 1, t)
                else s.copy(lastTs = t)
            SessionAssignment(e.event_id, user, s.sessionCount)
          }
          state.update(s)
          out.iterator
      }
  }

  /** The same gap sessionization on the `transformWithState` API
    * (Spark 4's successor to flatMapGroupsWithState): typed ValueState
    * survives across micro-batches in the state store, per-key rows
    * arrive batched, and the processor owns its state lifecycle
    * (`init`/`handleInputRows`). Parity with [[sessionize]] is
    * spec-enforced — both must assign identical session ids batch over
    * batch. At scale this is the API that adds state TTL, timers, and
    * multiple typed state variables without a state-schema rewrite. */
  final class SessionProcessor(gapSeconds: Long)
      extends StatefulProcessor[Long, Event, SessionAssignment] {
    @transient private var state: ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SessionState]("session",
        Encoders.product[SessionState], TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[Event],
                                 timers: TimerValues): Iterator[SessionAssignment] = {
      var s = if (state.exists()) state.get() else SessionState(0, Long.MinValue)
      val out = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).map { e =>
        val t = e.ts.getTime / 1000
        s = if (s.lastTs == Long.MinValue || t - s.lastTs > gapSeconds)
              SessionState(s.sessionCount + 1, t)
            else s.copy(lastTs = t)
        SessionAssignment(e.event_id, user, s.sessionCount)
      }
      state.update(s)
      out.iterator
    }
  }

  def sessionizeTws(events: Dataset[Event], gapSeconds: Long): Dataset[SessionAssignment] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapSeconds),
        TimeMode.None(), OutputMode.Append())
  }
}
