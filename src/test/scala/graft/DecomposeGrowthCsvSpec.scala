package graft

import org.apache.spark.sql.functions._

/** q_seasonal_decompose, q_growth_accounting, q_csv_ingest: exact
  * driver replays on sf0.001 plus structural identities (decomposition
  * adds back up; new+retained+resurrected = WAU; CSV round-trip equals
  * the source). */
class DecomposeGrowthCsvSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"
  private def q(key: String) = SparkEntry.queries(key)(spark, dir)

  test("seasonal decomposition matches an exact fixed-point replay") {
    val months = spark.read.parquet(s"$dir/orders.parquet")
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("m"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    val n = months.length
    val trend = months.indices.map { i =>
      if (i < 6 || i >= n - 6) None
      else {
        val s = (i - 6 to i + 6).map(j => BigInt(months(j)._2)).sum
        Some((2 * s * 10000 + 13) / 26)
      }
    }
    val det = months.indices.map { i =>
      trend(i).map(t => BigInt(months(i)._2) * 10000 - t)
    }
    val seas = months.indices.flatMap { i =>
      det(i).map(d => (months(i)._1.substring(5, 7), d))
    }.groupBy(_._1).view.mapValues { xs =>
      val sd = xs.map(_._2).sum
      val k = BigInt(xs.length)
      (2 * sd + k) / (2 * k)
    }.toMap
    // Output discipline (round-8 sf1 sweep): the query emits the BARE
    // IEEE division of exact scaled integers routed through long — no
    // round(x, 6) — so the replay does exactly the same.
    val expected = months.indices.map { i =>
      val (m, rev) = months(i)
      val sp = seas(m.substring(5, 7))
      (m, rev / 100.0,
        trend(i).map(t => t.toLong.toDouble / 1e6),
        sp.toLong.toDouble / 1e6,
        det(i).map(d => (d - sp).toLong.toDouble / 1e6))
    }.toSet
    val got = q("q_seasonal_decompose").collect().map { r =>
      (r.getString(0), r.getDouble(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        r.getDouble(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))
    }.toSet
    assert(got == expected && got.nonEmpty)
    // the decomposition adds back up where trend is defined
    got.foreach {
      case (m, rev, Some(tr), sp, Some(res)) =>
        assert(math.abs(tr + sp + res - rev) < 1e-4, s"$m does not re-add")
      case _ =>
    }
  }

  test("growth accounting matches a driver replay; identity holds") {
    // purchase-active (any-event activity is dense every week on this
    // fixture and made resurrect/churn structurally impossible)
    val wk = eventsTable(dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"),
        to_date(date_trunc("week", col("ts"))).as("wk"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val gmax = wk.map(_._2).maxBy(_.toEpochDay)
    val events = wk.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      val weeks = xs.map(_._2).sortBy(_.toEpochDay)
      val actives = weeks.zipWithIndex.map { case (w, i) =>
        val kind =
          if (i == 0) "new"
          else if (weeks(i - 1).plusDays(7) == w) "retained"
          else "resurrected"
        (w, kind)
      }
      val gapChurn = weeks.sliding(2).collect {
        case Array(p, c) if p.plusDays(7).isBefore(c) => (p.plusDays(7), "churned")
      }.toSeq
      val lastChurn =
        if (!weeks.last.plusDays(7).isAfter(gmax))
          Seq((weeks.last.plusDays(7), "churned"))
        else Nil
      actives ++ gapChurn ++ lastChurn
    }
    val expected = events.groupBy(_._1).map { case (w, xs) =>
      (w.toString, xs.count(_._2 == "new").toLong,
        xs.count(_._2 == "retained").toLong,
        xs.count(_._2 == "resurrected").toLong,
        xs.count(_._2 == "churned").toLong)
    }.toSet
    val got = q("q_growth_accounting").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected && got.nonEmpty)
    // identity: new + retained + resurrected = WAU per week
    val wau = wk.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    got.foreach { case (w, nw, rt, rs, _) =>
      wau.get(java.time.LocalDate.parse(w)).foreach { u =>
        assert(nw + rt + rs == u, s"week $w: $nw+$rt+$rs != WAU $u")
      }
    }
  }

  test("CSV round-trip equals a recompute from the source table") {
    val expected = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderstatus") =!= "P")
      .groupBy(col("o_orderstatus"),
        date_format(col("o_orderdate"), "yyyy").as("yr"))
      .agg(count(lit(1)).as("n"),
        sum((col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
          .as("sum_cents"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    val got = q("q_csv_ingest").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected && got.nonEmpty)
  }
}
