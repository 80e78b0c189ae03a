package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, NumericType, TimestampNTZType, TimestampType}

/** One-pass column profiling — the stats-collection sweep (ANALYZE
  * TABLE) that feeds cost-based optimizers, data-quality monitors, and
  * drift alerts. One aggregate job emits per-column null counts,
  * distinct counts, and numeric bounds, then unpivots to a row per
  * column — profiling a 100-TB table costs one scan, not one per
  * column.
  *
  * Numeric bounds canonicalize to DOUBLE (longs < 2^53 and epoch-µs
  * timestamps are exact; string columns report NULL bounds) — never
  * engine-specific text formatting, so the output is oracle-portable.
  *
  * Exact distinct counts make the profile oracle-checkable here; each
  * distinct aggregate adds an Expand pass over the input, so AT SCALE
  * pass `approxRsd = Some(0.05)` to switch every column to the
  * constant-memory HLL sketch (one real pass, driver-checkable error
  * bound — the q_approx_distinct contract).
  */
object Profiler {

  private def numericized(df: DataFrame, c: String): Option[Column] =
    df.schema(c).dataType match {
      case _: NumericType => Some(col(c).cast(DoubleType))
      // NTZ reinterprets as session-zone (UTC here) instants, matching
      // an oracle's epoch_us over the same naive values
      case TimestampType | TimestampNTZType =>
        Some(unix_micros(col(c).cast(TimestampType)).cast(DoubleType))
      case _ => None
    }

  /** Profile `cols` (default: every column) in one aggregate pass.
    * @return one row per column: (col_name, n_nulls, n_distinct,
    *         min_num, max_num) ordered as given */
  def profile(df: DataFrame, cols: Seq[String] = Nil,
              approxRsd: Option[Double] = None): DataFrame = {
    val names = if (cols.nonEmpty) cols else df.columns.toSeq
    val aggs = names.flatMap { c =>
      val nd = approxRsd.map(r => approx_count_distinct(col(c), r))
        .getOrElse(count_distinct(col(c)))
      val num = numericized(df, c)
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c"),
        nd.as(s"__nd_$c"),
        num.map(min).getOrElse(lit(null).cast(DoubleType)).as(s"__mn_$c"),
        num.map(max).getOrElse(lit(null).cast(DoubleType)).as(s"__mx_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the single wide row to a row per column
    val stacked = names.map { c =>
      struct(lit(c).as("col_name"), col(s"__nn_$c").as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_num"), col(s"__mx_$c").as("max_num"))
    }
    wide.select(explode(array(stacked: _*)).as("__p")).select("__p.*")
  }
}
