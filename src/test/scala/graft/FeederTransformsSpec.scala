package graft

import org.apache.spark.sql.functions._
import graft.operators.FeederTransforms._

class FeederTransformsSpec extends GraftSuite {
  import spark.implicits._

  test("resultFor maps status codes like feeder.py:164-171") {
    val out = Seq("F", "O", "P", "X").toDF("c")
      .select(resultFor(col("c")).as("r")).as[String].collect()
    assert(out.toSeq == Seq("full", "reject", "partial", "partial"))
  }

  test("statusFor: full → complete, rest interrupted") {
    val out = Seq("full", "partial", "reject").toDF("r")
      .select(statusFor(col("r")).as("s")).as[String].collect()
    assert(out.toSeq == Seq("complete", "interrupted", "interrupted"))
  }

  test("normalizeDate reparses dd.MM.yyyy HH:mm:ss") {
    val out = Seq("31.12.1999 23:59:59", "01.02.2020 00:00:00").toDF("d")
      .select(normalizeDate(col("d")).as("n")).as[String].collect()
    assert(out.toSeq == Seq("1999-12-31", "2020-02-01"))
  }

  test("clampSmallint caps at 32767, leaves smaller values") {
    val out = Seq(40000, 32767, 5, -3).toDF("x")
      .select(clampSmallint(col("x")).as("c")).as[Int].collect()
    assert(out.toSeq == Seq(32767, 32767, 5, -3))
  }

  test("truncateTo cuts at n chars") {
    val out = Seq("abcdefghijKLM", "ab").toDF("s")
      .select(truncateTo(col("s"), 10).as("t")).as[String].collect()
    assert(out.toSeq == Seq("abcdefghij", "ab"))
  }

  test("nanToNull nulls NaN only; blankToNull nulls whitespace-only") {
    val nan = Seq(Double.NaN, 1.5).toDF("x")
      .select(nanToNull(col("x")).as("v")).collect()
    assert(nan(0).isNullAt(0) && nan(1).getDouble(0) == 1.5)
    val blank = Seq("  ", "", " a ").toDF("s")
      .select(blankToNull(col("s")).as("v")).collect()
    assert(blank(0).isNullAt(0) && blank(1).isNullAt(0) && blank(2).getString(0) == " a ")
  }

  test("waveFromName takes trailing two chars as int (feeder.py:124-125)") {
    val out = Seq("CATI_W07", "project42").toDF("n")
      .select(waveFromName(col("n")).as("w")).as[Int].collect()
    assert(out.toSeq == Seq(7, 42))
  }

  test("waveFromNameLoose strips the w marker (feeder_w6.py:126)") {
    val out = Seq("CATI_w6", "CATI_W10").toDF("n")
      .select(waveFromNameLoose(col("n")).as("w")).as[Int].collect()
    assert(out.toSeq == Seq(6, 10))
  }

  test("recruitCounterId: strict matches the dashed name only " +
    "(feeder.py:45-48); w6 also accepts the bare name (feeder_w6.py:46-48)") {
    import graft.sources.v2.ExportLifecycle.{recruitCounterId, RecruitCounterName, RecruitCounterNameBare}
    val dashed = Seq(11L -> "ИНТЕРВЬЮ", 42L -> RecruitCounterName)
    val bare = Seq(11L -> "ИНТЕРВЬЮ", 43L -> RecruitCounterNameBare)
    assert(recruitCounterId(dashed) == Some(42L))
    assert(recruitCounterId(bare) == None) // strict feeder: bare name is NOT the counter
    assert(recruitCounterId(bare, w6Fallback = true) == Some(43L))
    assert(recruitCounterId(dashed, w6Fallback = true) == Some(42L))
    // first match in listing order wins (the reference returns inside the loop)
    assert(recruitCounterId(
      Seq(1L -> RecruitCounterName, 2L -> RecruitCounterName)) == Some(1L))
    assert(recruitCounterId(Seq(9L -> "какой-то другой")) == None)
  }
}
