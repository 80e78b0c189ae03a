package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed upsert/merge.
  *
  * The reference issues one `UPDATE recruits_log SET col = %s WHERE id = %s`
  * per spreadsheet row (add_q5010.py:33-40, add_q5011_2t.py:72-84). The
  * relational equivalent is a merge: join base to updates on the key and
  * coalesce update values over base values. Executed as one distributed
  * join — broadcast when the updates side is small (the common case for a
  * correction file), shuffled hash otherwise.
  */
object Upsert {

  /** UPDATE-only semantics (add_q5010.py): base rows keep their identity;
    * rows with a matching update take the update's values for
    * `updateCols`; updates without a matching base row are dropped. */
  def update(base: DataFrame, updates: DataFrame, key: String,
             updateCols: Seq[String],
             broadcastUpdates: Boolean = true): DataFrame = {
    val u0 = updates.select((key +: updateCols).map(col): _*)
    val renamed = updateCols.foldLeft(u0)((d, c) => d.withColumnRenamed(c, s"__u_$c"))
    val right = if (broadcastUpdates) broadcast(renamed) else renamed
    val joined = base.join(right, Seq(key), "left")
    val projected = base.columns.map { c =>
      if (updateCols.contains(c)) coalesce(col(s"__u_$c"), col(c)).as(c)
      else col(c)
    }
    joined.select(projected.toIndexedSeq: _*)
  }

  /** Insert-or-update merge: matched rows take update values, unmatched
    * updates are appended as new rows. Full-outer join + coalesce. */
  def merge(base: DataFrame, updates: DataFrame, key: String): DataFrame = {
    val cols = base.columns
    val renamed = cols.filter(_ != key)
      .foldLeft(updates)((d, c) =>
        if (d.columns.contains(c)) d.withColumnRenamed(c, s"__u_$c") else d)
    val joined = base.join(renamed, Seq(key), "full_outer")
    val projected = cols.map { c =>
      if (c == key) col(key)
      else if (renamed.columns.contains(s"__u_$c")) coalesce(col(s"__u_$c"), col(c)).as(c)
      else col(c)
    }
    joined.select(projected.toIndexedSeq: _*)
  }
}
