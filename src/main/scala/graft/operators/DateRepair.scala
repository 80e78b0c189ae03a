package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Month-offset date repair (add_q5011_2t.py).
  *
  * The reference processes one spreadsheet ("file") at a time: it decides
  * from the file's FIRST row whether the recruiting-date month is shifted
  * relative to the interview date (add_q5011_2t.py:27-45), then for every
  * row either fills a missing recruiting date from IVDate1 or — when the
  * file-level flag is set — bumps the month by string surgery
  * (add_q5011_2t.py:58-103, month `+1` formatted `%02d`, intentionally NOT
  * wrapping past 12, mirroring the reference exactly).
  *
  * Spark re-expression: the per-file decision is a grouped aggregate
  * (`min_by` picks the first row per group without any sort of the full
  * data), joined back to the rows — one shuffle on the group key plus one
  * broadcastable join; no per-file driver loop, so a million "files"
  * repair in one job.
  */
object DateRepair {

  /** Month bump by string surgery on `yyyy-MM-dd HH:mm:ss`:
    * `f"{int(month)+1:02d}"` (add_q5011_2t.py:86-103). */
  def bumpMonth(iso: Column): Column =
    concat(
      substring(iso, 1, 5),
      lpad((substring(iso, 6, 2).cast("int") + 1).cast("string"), 2, "0"),
      substring(iso, 8, 12))

  /** Repair `recruitCol` (ISO `yyyy-MM-dd HH:mm:ss` string, nullable) per
    * group:
    *   - group flag = month of first row's interview ts != month of the
    *     first non-null recruiting date (reference `is_month_incorrect`);
    *   - null recruiting date → interview date formatted ISO;
    *   - flagged group → month-bumped recruiting date.
    *
    * @param ivTsCol  interview timestamp column (already parsed)
    * @param orderCol defines "first" within a group (file row order)
    */
  def repair(df: DataFrame, groupCol: String, orderCol: String,
             recruitCol: String, ivTsCol: String): DataFrame = {
    val flags = df.groupBy(col(groupCol)).agg(
      expr(s"month(min_by($ivTsCol, $orderCol))").as("__iv_month"),
      expr(s"min_by(cast(substring($recruitCol, 6, 2) as int), $orderCol) " +
           s"FILTER (WHERE $recruitCol IS NOT NULL)").as("__rec_month"))
      .withColumn("__month_incorrect",
        coalesce(col("__rec_month") =!= col("__iv_month"), lit(false)))
      .select(col(groupCol), col("__month_incorrect"))

    df.join(broadcast(flags), Seq(groupCol))
      .withColumn(recruitCol,
        when(col(recruitCol).isNull,
          date_format(col(ivTsCol), "yyyy-MM-dd HH:mm:ss"))
          .when(col("__month_incorrect"), bumpMonth(col(recruitCol)))
          .otherwise(col(recruitCol)))
      .drop("__month_incorrect")
  }
}
