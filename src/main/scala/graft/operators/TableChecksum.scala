package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Order-independent table checksums — the anti-entropy primitive for
  * validating that two copies of a dataset (cluster A vs cluster B, or
  * pre- vs post-migration) hold the same rows without shipping either
  * copy. Each row folds to a 55-bit fingerprint of its canonical
  * string; a partition's checksum is the SUM of its row fingerprints
  * mod a prime — addition commutes, so the checksum is independent of
  * row order AND of how rows are distributed across tasks, and two
  * copies compare one small row per partition.
  *
  * Engine-portable by construction: canonical string → md5 (identical
  * hex in any engine) → polynomial char fold (the docFingerprint
  * oracle pattern) → modular sum — so a DuckDB/Postgres/Go auditor can
  * recompute the same checksums. The per-row fold keeps the modular
  * accumulation < 2^55; the cross-row sum rides DECIMAL(38,0) to dodge
  * long overflow before the final mod.
  *
  * Canonicalization contract: the caller passes STRING-typed field
  * expressions (cast numerics through fixed-point, timestamps through
  * epoch micros — never raw doubles, whose text form is
  * engine-specific). Fields join on the  separator (`chr(1)` in
  * SQL); concat_ws skips NULLs in every engine, so a NULL field and an
  * absent field collide — fine for change DETECTION, not an integrity
  * proof.
  */
object TableChecksum {

  /** 55-bit per-row fingerprint of the canonical fields. */
  def rowFingerprint(fields: Seq[Column]): Column =
    TextAnalysis.fingerprint(md5(concat_ws("", fields: _*)))

  /** One (groups..., n_rows, checksum) row per group. Group by a
    * partition key (day, month, shard) so a mismatch localizes to one
    * partition instead of "somewhere in 100 TB". */
  def checksumBy(df: DataFrame, groups: Seq[(String, Column)],
                 fields: Seq[Column]): DataFrame =
    df.select(groups.map { case (n, c) => c.as(n) } :+
        rowFingerprint(fields).as("__fp"): _*)
      .groupBy(groups.map { case (n, _) => col(n) }: _*)
      .agg(count(lit(1)).as("n_rows"),
        pmod(sum(col("__fp").cast("decimal(38,0)")),
          lit(TextAnalysis.FingerprintMod).cast("decimal(38,0)"))
          .cast("long").as("checksum"))
}
