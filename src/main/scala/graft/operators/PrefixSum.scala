package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed global prefix sum — the scan primitive behind sequence
  * packing, offset assignment, and file-splitting in a training-data
  * pipeline.
  *
  * The naive Spark form, `sum(x) OVER (ORDER BY k ROWS UNBOUNDED
  * PRECEDING)`, is an unpartitioned window: every row funnels through
  * ONE reducer — the canonical scale-killer. This is the classic
  * two-phase scan instead:
  *
  *   1. range-partition on the order key + sort within partitions
  *      (global order, no global sort);
  *   2. pass 1: per-partition totals → the driver scans them into
  *      per-partition starting offsets (O(partitions) driver memory);
  *   3. pass 2: map-side `offset + local running sum` per row.
  *
  * Both passes MUST reuse the one shuffled lineage (same rule as
  * PagedReader.pageBoundsDistributed): rebuilding the pipeline per pass
  * could sample different range bounds.
  *
  * `orderCol` must be unique — with duplicate keys the relative order
  * of equal keys (and so their running totals) is partition-placement
  * dependent.
  */
object PrefixSum {

  /** @return (orderCol, valueCol as long, running_total) where
    *         running_total is the INCLUSIVE prefix sum in `orderCol`
    *         order; null values count as 0 */
  def runningTotal(df: DataFrame, orderCol: String, valueCol: String): DataFrame = {
    val spark = df.sparkSession
    val parts = math.max(spark.sparkContext.defaultParallelism, 1)
    val keyed = df.select(col(orderCol).as("__k"),
        coalesce(col(valueCol).cast("long"), lit(0L)).as("__x"))
      .repartitionByRange(parts, col("__k"))
      .sortWithinPartitions("__k")
      .rdd.map(r => (r.get(0), r.getLong(1)))
    val partSums = keyed
      .mapPartitionsWithIndex((i, it) => Iterator((i, it.map(_._2).sum)))
      .collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _)
    val rows = keyed.mapPartitionsWithIndex { (i, it) =>
      var run = offsets(i)
      it.map { case (k, x) => run += x; Row(k, x, run) }
    }
    val schema = StructType(Seq(
      df.schema(orderCol).copy(name = orderCol),
      StructField(valueCol, LongType, nullable = false),
      StructField("running_total", LongType, nullable = false)))
    spark.createDataFrame(rows, schema)
  }

  /** Multi-column sibling of [[runningTotal]]: N inclusive prefix sums
    * over the SAME order key in ONE two-phase scan — one range shuffle
    * and one O(partitions·N) driver combine, instead of N independent
    * scans re-joined on the key (which is N range shuffles, N driver
    * collects and an (N−1)-way sort-merge join; q_jonckheere paid
    * exactly that for its five ordered-group scans).
    *
    * @return (orderCol, valueCols as long ..., r_<valueCol> ...) where
    *         r_<c> is the inclusive prefix sum of c in `orderCol`
    *         order; null values count as 0 */
  def runningTotals(df: DataFrame, orderCol: String,
                    valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty)
    val spark = df.sparkSession
    val parts = math.max(spark.sparkContext.defaultParallelism, 1)
    val n = valueCols.length
    val keyed = df.select(col(orderCol).as("__k") +:
        valueCols.map(c => coalesce(col(c).cast("long"), lit(0L)).as(c)): _*)
      .repartitionByRange(parts, col("__k"))
      .sortWithinPartitions("__k")
      .rdd.map { r =>
        val xs = new Array[Long](n)
        var i = 0
        while (i < n) { xs(i) = r.getLong(i + 1); i += 1 }
        (r.get(0), xs)
      }
    val partSums = keyed.mapPartitionsWithIndex { (i, it) =>
      val acc = new Array[Long](n)
      it.foreach { kv =>
        var j = 0
        while (j < n) { acc(j) += kv._2(j); j += 1 }
      }
      Iterator((i, acc))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(new Array[Long](n)) { (a, b) =>
      Array.tabulate(n)(j => a(j) + b(j))
    }
    val rows = keyed.mapPartitionsWithIndex { (i, it) =>
      val run = offsets(i).clone()
      it.map { case (k, xs) =>
        var j = 0
        while (j < n) { run(j) += xs(j); j += 1 }
        Row.fromSeq(k +: (xs ++ run).toSeq)
      }
    }
    val schema = StructType(
      df.schema(orderCol).copy(name = orderCol) +:
        (valueCols.map(c => StructField(c, LongType, nullable = false)) ++
          valueCols.map(c => StructField(s"r_$c", LongType, nullable = false))))
    spark.createDataFrame(rows, schema)
  }

  /** Distributed EXCLUSIVE prefix max — "the largest value seen before
    * this row in `orderCol` order", e.g. the high-watermark before each
    * event in arrival order. Same two-phase scan as `runningTotal`
    * (range-partition + per-partition pass + O(partitions) driver
    * combine — never a single-reducer unbounded window); every input
    * column is preserved and `outCol` (nullable long; null = no prior
    * row) is appended. `valueCol` must be LONG and non-null. */
  def runningMaxExclusive(df: DataFrame, orderCol: String, valueCol: String,
                          outCol: String = "prev_max"): DataFrame = {
    val spark = df.sparkSession
    val parts = math.max(spark.sparkContext.defaultParallelism, 1)
    val vi = df.schema.fieldIndex(valueCol)
    require(df.schema(vi).dataType == LongType, s"$valueCol must be LONG")
    // both passes MUST reuse this one shuffled lineage (same rule as
    // runningTotal): rebuilding could sample different range bounds
    val keyed = df.repartitionByRange(parts, col(orderCol))
      .sortWithinPartitions(orderCol).rdd
    val partMax: Array[Option[Long]] = keyed.mapPartitionsWithIndex { (i, it) =>
      var m = Long.MinValue; var any = false
      it.foreach { r => val v = r.getLong(vi); if (v > m) m = v; any = true }
      Iterator((i, if (any) Some(m) else None))
    }.collect().sortBy(_._1).map(_._2)
    val offsets: Array[Option[Long]] =
      partMax.scanLeft(None: Option[Long]) { (acc, m) =>
        (acc ++ m).reduceOption(_ max _)
      }.toArray
    val rows = keyed.mapPartitionsWithIndex { (i, it) =>
      var cur = offsets(i)
      it.map { r =>
        val out = Row.fromSeq(r.toSeq :+ cur.map(Long.box).orNull)
        val v = r.getLong(vi)
        if (cur.forall(_ < v)) cur = Some(v)
        out
      }
    }
    spark.createDataFrame(rows,
      StructType(df.schema.fields :+ StructField(outCol, LongType, nullable = true)))
  }

  /** Global rank AND inclusive running total in ONE two-phase scan —
    * for consumers that need both (ABC curves, Pareto shares), which
    * previously ran `withGlobalRank` + `runningTotal` back to back:
    * two range shuffles, two driver collects, and a re-join on the
    * rank. Same contracts as the parts: `orderCols` unique per row,
    * nulls in `valueCol` count as 0; all input columns are preserved,
    * `rankCol` (1-based long) and `totalCol` (inclusive prefix sum of
    * `valueCol` in `orderCols` order) are appended. */
  def withRankAndRunningTotal(df: DataFrame, orderCols: Seq[String],
                              valueCol: String,
                              rankCol: String = "rank",
                              totalCol: String = "running_total"): DataFrame = {
    require(orderCols.nonEmpty)
    val spark = df.sparkSession
    val parts = math.max(spark.sparkContext.defaultParallelism, 1)
    val vi = df.schema.fieldIndex(valueCol)
    require(df.schema(vi).dataType == LongType, s"$valueCol must be LONG")
    // both passes MUST reuse this one shuffled lineage (same rule as
    // runningTotal): rebuilding could sample different range bounds
    val keyed = df.repartitionByRange(parts, orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*).rdd
    val partAgg = keyed.mapPartitionsWithIndex { (i, it) =>
      var n = 0L; var s = 0L
      it.foreach { r => n += 1; if (!r.isNullAt(vi)) s += r.getLong(vi) }
      Iterator((i, (n, s)))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = partAgg.scanLeft((0L, 0L)) { case ((n0, s0), (n, s)) =>
      (n0 + n, s0 + s)
    }
    val rows = keyed.mapPartitionsWithIndex { (i, it) =>
      var r = offsets(i)._1
      var run = offsets(i)._2
      it.map { row =>
        r += 1
        if (!row.isNullAt(vi)) run += row.getLong(vi)
        Row.fromSeq(row.toSeq :+ r :+ run)
      }
    }
    spark.createDataFrame(rows,
      StructType(df.schema.fields :+
        StructField(rankCol, LongType, nullable = false) :+
        StructField(totalCol, LongType, nullable = false)))
  }

  /** Sequence packing: assign each document to a fixed-token-budget bin
    * by its starting offset in the global token stream — `pack_id =
    * (running_total - n_tokens) div budget`. Deterministic (id-ordered),
    * one distributed scan, no single-reducer window; downstream
    * repartitioning on pack_id co-locates each bin's documents. */
  def packByBudget(docs: DataFrame, idCol: String, tokensCol: String,
                   budget: Long): DataFrame = {
    require(budget > 0)
    // integer `div`, not `/`: Column `/` is double division, and a
    // 100-TB token total exceeds 2^53 where double floor goes inexact
    runningTotal(docs, idCol, tokensCol)
      .select(col(idCol), col(tokensCol),
        expr(s"(running_total - $tokensCol) div $budget").as("pack_id"))
  }

  /** Distributed GLOBAL RANK (1..n) in `orderCols` order — the dense
    * row-number primitive behind equi-depth histograms, distributed
    * ntile, and deterministic pagination. Same two-phase scan as
    * `runningTotal`: range-partition on the order key (global order
    * without a global sort), per-partition row counts combine on the
    * driver into O(partitions) starting offsets, then a map-side local
    * counter. Never the single-reducer `row_number() OVER (ORDER BY …)`
    * window. All input columns are preserved; `outCol` (long, 1-based)
    * is appended. The composite `orderCols` must be unique per row —
    * with duplicates the rank of equal keys is partition-placement
    * dependent (same contract as `runningTotal`). */
  def withGlobalRank(df: DataFrame, orderCols: Seq[String],
                     outCol: String = "rank"): DataFrame = {
    require(orderCols.nonEmpty)
    val spark = df.sparkSession
    val parts = math.max(spark.sparkContext.defaultParallelism, 1)
    // both passes MUST reuse this one shuffled lineage (same rule as
    // runningTotal): rebuilding could sample different range bounds
    val keyed = df.repartitionByRange(parts, orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*).rdd
    val partCounts = keyed
      .mapPartitionsWithIndex((i, it) => Iterator((i, it.size.toLong)))
      .collect().sortBy(_._1).map(_._2)
    val offsets = partCounts.scanLeft(0L)(_ + _)
    val rows = keyed.mapPartitionsWithIndex { (i, it) =>
      var r = offsets(i)
      it.map { row => r += 1; Row.fromSeq(row.toSeq :+ r) }
    }
    spark.createDataFrame(rows,
      StructType(df.schema.fields :+ StructField(outCol, LongType, nullable = false)))
  }
}
