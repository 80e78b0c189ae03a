package graft

import org.apache.spark.sql.functions._

/** q_line_dedup, q_late_arrival, q_dead_letter: hand recomputation on
  * the sf0.001 fixtures plus the shapes that keep each scale-safe
  * (broadcast hot-passage anti-join, distributed prefix max, map-only
  * validation). */
class PipelineHygieneSpec extends GraftSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def q(key: String) = SparkEntry.queries(key)(spark, dir)

  private def docs = spark.read.parquet(s"$dir/documents.parquet")
  private def events = {
    eventsTable(dir)
  }

  // ------------------------------------------------------------ line dedup

  private def handBlocks: Map[Long, Seq[String]] =
    docs.select("doc_id", "text").collect().map { r =>
      r.getLong(0) -> r.getString(1).trim.split("\\s+").toSeq
        .grouped(2).map(_.mkString(" ")).toSeq
    }.toMap

  test("passage dedup removes exactly the df>10 passages and reassembles in order") {
    val blocks = handBlocks
    val df = blocks.toSeq.flatMap { case (id, bs) => bs.distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.size).toMap
    val expected = blocks.flatMap { case (id, bs) =>
      val kept = bs.filter(b => df(b) <= 10)
      if (kept.isEmpty) None
      else Some(id -> ((bs.size.toLong, kept.size.toLong, kept.mkString(" "))))
    }
    val got = q("q_line_dedup").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got == expected)
    // non-vacuous on the fixture: some passages removed, some kept
    assert(expected.exists { case (id, (nb, nk, _)) => nk < nb }, "nothing was removed")
    assert(expected.nonEmpty, "everything was removed")
  }

  test("hot-passage dictionary broadcasts into the anti-join") {
    val plan = q("q_line_dedup").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected a broadcast left-anti join against the hot set:\n$plan")
  }

  // ---------------------------------------------------------- late arrival

  test("late-arrival audit matches the single-window recomputation") {
    // every 97th event is deterministically delayed 2h in event time —
    // the time-ordered synthetic feed otherwise never fires the audit
    // full-µs event time (the fixture has sub-millisecond components —
    // a getTime*1000 replay truncates and drifts from unix_micros)
    val rows = events.select(col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getLong(2) - (if (r.getLong(0) % 97 == 0) 7200000000L else 0L)))
      .sortBy(_._1)
    var best = Long.MinValue
    val perType = collection.mutable.Map.empty[String, (Long, Long, Long)]
    rows.foreach { case (_, t, us) =>
      val late = if (best == Long.MinValue) 0L else math.max(best - us, 0L)
      val (n, nl, mx) = perType.getOrElse(t, (0L, 0L, 0L))
      perType(t) = (n + 1, nl + (if (late > 600000000L) 1 else 0), math.max(mx, late))
      if (us > best) best = us
    }
    val got = q("q_late_arrival").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == perType.toMap)
    assert(got.values.map(_._1).sum == rows.length)
    // the audit must BITE: the injected 2h delays exceed the 10-min
    // tolerance, so late events exist at every shipped SF
    assert(got.values.map(_._2).sum > 0, "no late arrivals detected")
  }

  test("late-arrival plan has no unpartitioned window") {
    val plan = q("q_late_arrival").queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"the prefix max must be the distributed scan, not a global window:\n$plan")
  }

  // ----------------------------------------------------------- dead letter

  test("dead-letter reasons and counts match a hand validation") {
    val expected = events.select("event_id", "event_type", "props").collect()
      .flatMap { r =>
        val (id, t, props) = (r.getLong(0), r.getString(1), r.getString(2))
        val raw =
          if (id % 37 == 0) props.dropRight(1)
          else if (id % 41 == 0) """{"j": 1}"""
          else if (id % 43 == 0) """{"k": "oops"}"""
          else props
        val k = "\"k\": (\\d+)".r.findFirstMatchIn(raw).map(_.group(1).toInt)
        val reason =
          if (id % 37 == 0) "malformed_json"
          else if (id % 41 == 0) "missing_field"
          else if (id % 43 == 0) "bad_type"
          else if (k.exists(_ > 95)) "out_of_range"
          else "ok"
        if (reason == "ok") None else Some(((t, reason), id))
      }
      .groupBy(_._1).view
      .mapValues(g => (g.length.toLong, g.map(_._2).min)).toMap
    val got = q("q_dead_letter").collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected)
    assert(expected.keySet.map(_._2) ==
      Set("malformed_json", "missing_field", "bad_type", "out_of_range"),
      s"every corruption class must appear: ${expected.keySet}")
  }

  test("validation precedence: a doubly-corrupt id takes the first failing check") {
    // 37·41 = 1517: divisible by both ⇒ the truncated (malformed) form
    // wins over the missing-field substitution
    val ev = Seq((1517L, "t", """{"k": 5}""")).toDF("event_id", "event_type", "props")
    val out = ev
      .withColumn("raw",
        when(col("event_id") % 37 === 0, expr("substr(props, 1, length(props) - 1)"))
          .when(col("event_id") % 41 === 0, lit("""{"j": 1}"""))
          .otherwise(col("props")))
      .withColumn("reason",
        when(get_json_object(col("raw"), "$").isNull, "malformed_json")
          .when(get_json_object(col("raw"), "$.k").isNull, "missing_field")
          .otherwise("ok"))
      .head()
    assert(out.getAs[String]("reason") == "malformed_json")
  }

  test("dead-letter validation is map-only before the final aggregate") {
    val plan = q("q_dead_letter").queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Window"),
      s"validation must not shuffle per-row:\n$plan")
  }
}
