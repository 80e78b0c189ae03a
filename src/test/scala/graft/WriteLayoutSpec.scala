package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.operators.WriteLayout

class WriteLayoutSpec extends GraftSuite {
  import spark.implicits._

  // skewed: value "big" has 25x the rows of "small"
  private def skewed = ((1 to 5000).map(i => ("big", i.toLong)) ++
    (1 to 200).map(i => ("small", i.toLong))).toDF("part", "v")

  private def parquetFiles(dir: String): Seq[java.io.File] =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).toSeq

  test("writePartitioned bounds file sizes and file counts per value") {
    val out = Files.createTempDirectory("graft_layout").toString
    val target = 1000L
    WriteLayout.writePartitioned(skewed, out, Seq("part"), target)
    // per-value directories exist
    val bigFiles = parquetFiles(s"$out/part=big")
    val smallFiles = parquetFiles(s"$out/part=small")
    assert(bigFiles.nonEmpty && smallFiles.nonEmpty)
    // big: 5000 rows / (0.9 * 1000) headroom packing = 6 slots; two
    // light slots in one write task can merge into one file (floor
    // ⌈rows/target⌉ = 5) and the maxRecordsPerFile backstop can split
    // a heavy one — bounded both ways, never ballooning
    assert(bigFiles.length >= 5 && bigFiles.length <= 9,
      s"big has ${bigFiles.length} files")
    assert(smallFiles.length == 1, s"small has ${smallFiles.length} files")
    // HARD bound: no file exceeds the target row count
    (bigFiles ++ smallFiles).foreach { f =>
      val n = spark.read.parquet(f.getAbsolutePath).count()
      assert(n <= target, s"${f.getName} has $n rows > $target")
    }
    // round trip: nothing lost, nothing duplicated
    val back = spark.read.parquet(out)
    assert(back.count() == 5200)
    assert(back.select(sum("v")).first().getLong(0) ==
      skewed.select(sum("v")).first().getLong(0))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
  }

  test("planLayout salts skewed values across multiple slots") {
    val planned = WriteLayout.planLayout(skewed, Seq("part"), 1000L)
    val slots = planned.groupBy("part")
      .agg(countDistinct(col("__slot")).as("n_slots"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(slots("big") == 6, s"big got ${slots("big")} slots")
    assert(slots("small") == 1)
    // deterministic: same plan twice yields identical slot assignment
    val a = planned.orderBy("part", "v").collect().map(_.toString).toSeq
    val b = WriteLayout.planLayout(skewed, Seq("part"), 1000L)
      .orderBy("part", "v").collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("NULL partition values are written, not silently dropped") {
    val out = Files.createTempDirectory("graft_layout_null").toString
    val withNulls = Seq(("a", 1L), (null, 2L), (null, 3L), ("b", 4L))
      .toDF("part", "v")
    WriteLayout.writePartitioned(withNulls, out, Seq("part"), 1000L)
    val back = spark.read.parquet(out)
    assert(back.count() == 4, "NULL-partition rows must round-trip")
    assert(back.filter(col("part").isNull).count() == 2)
    assert(back.select(sum("v")).first().getLong(0) == 10L)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
  }

  test("layout stays defined when every column is a partition column") {
    val df = Seq(("x", "y"), ("x", "z")).toDF("a", "b")
    val planned = WriteLayout.planLayout(df, Seq("a", "b"), 10L)
    assert(planned.count() == 2) // no AnalysisException from an empty hash
  }

  test("single partition value below target writes exactly one file") {
    val out = Files.createTempDirectory("graft_layout_one").toString
    WriteLayout.writePartitioned(
      (1 to 50).map(i => ("only", i)).toDF("part", "v"), out, Seq("part"), 1000L)
    assert(parquetFiles(s"$out/part=only").length == 1)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
  }
}
