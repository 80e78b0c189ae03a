package graft

import org.apache.spark.sql.functions._
import graft.operators.TableChecksum

class TableChecksumSpec extends GraftSuite {
  import spark.implicits._

  private def rows = Seq(
    ("a", 1L, "x"), ("a", 2L, "y"), ("b", 3L, "z"),
  ).toDF("grp", "id", "payload")

  private def sum3(df: org.apache.spark.sql.DataFrame) =
    TableChecksum.checksumBy(df, Seq("grp" -> col("grp")),
      Seq(col("id").cast("string"), col("payload")))

  test("checksum is independent of row order and partitioning") {
    val a = sum3(rows).orderBy("grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val b = sum3(rows.orderBy(col("id").desc).repartition(7)).orderBy("grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(a.toSeq == b.toSeq)
  }

  test("any single-field change flips the group checksum") {
    val base = sum3(rows).filter($"grp" === "a").collect().head.getLong(2)
    val changed = rows.withColumn("payload",
      when($"id" === 2L, lit("Y")).otherwise($"payload"))
    val after = sum3(changed).filter($"grp" === "a").collect().head.getLong(2)
    assert(base != after, "a one-character change must change the checksum")
  }

  test("equal multisets of rows give equal checksums across different groupings") {
    // same rows assigned to one group vs split across two: n_rows+checksum
    // of the union group equals the modular sum of the parts
    val whole = sum3(rows.withColumn("grp", lit("all"))).collect().head
    val parts = sum3(rows).collect()
    val mod = graft.operators.TextAnalysis.FingerprintMod
    val partSum = parts.map(r => BigInt(r.getLong(2))).sum.mod(BigInt(mod)).toLong
    assert(whole.getLong(1) == parts.map(_.getLong(1)).sum)
    assert(whole.getLong(2) == partSum, "checksums must add mod the prime")
  }

  test("fingerprints stay below the 55-bit modulus (no overflow before the DECIMAL sum)") {
    val fps = rows.select(TableChecksum.rowFingerprint(
      Seq(col("id").cast("string"), col("payload"))).as("fp"))
      .collect().map(_.getLong(0))
    assert(fps.forall(f => f >= 0 && f < graft.operators.TextAnalysis.FingerprintMod))
  }
}
