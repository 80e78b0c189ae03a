package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Row-transform suite of the reference feeder, re-expressed as pure
  * `Column` functions so Catalyst inlines them into the surrounding plan
  * (whole-stage codegen; filters composed from them still push down).
  *
  * Reference: feeder.py:146-225 (pandas row-at-a-time loop). Here each
  * transform is a declarative expression evaluated vectorized on
  * executors — no driver-side iteration at any scale.
  */
object FeederTransforms {

  /** Postgres smallint upper bound the reference clamps ages to
    * (feeder.py:180-182). */
  val SmallintMax = 32767

  /** Interview-result code → canonical result label. Models
    * feeder.py:164-171's domain ("Полное"/"Брак"/other) on the synthetic
    * order-status domain, ASCII-labelled: F→full, O→reject, else partial. */
  def resultFor(statusCode: Column): Column =
    when(statusCode === "F", "full")
      .when(statusCode === "O", "reject")
      .otherwise("partial")

  /** Rows the reference skips entirely (feeder.py:166-168). */
  def isReject(result: Column): Column = result === "reject"

  /** Result → load status (feeder.py:169-171): full interviews are
    * complete, everything else interrupted. */
  def statusFor(result: Column): Column =
    when(result === "full", "complete").otherwise("interrupted")

  /** `dd.MM.yyyy HH:mm:ss` → `yyyy-MM-dd` (feeder.py:173-174). */
  def normalizeDate(ivdate: Column): Column =
    date_format(to_timestamp(ivdate, "dd.MM.yyyy HH:mm:ss"), "yyyy-MM-dd")

  /** Clamp a numeric to the smallint range (feeder.py:180-182). */
  def clampSmallint(x: Column): Column = clampAt(x, SmallintMax)

  /** Generalized upper clamp. */
  def clampAt(x: Column, bound: Int): Column = least(x, lit(bound))

  /** `name[:100]` (feeder.py:205). */
  def truncateTo(s: Column, n: Int = 100): Column = substring(s, 1, n)

  /** NaN → NULL, the `results.replace({np.nan: None})` step
    * (feeder.py:146) for floating-point columns. */
  def nanToNull(x: Column): Column =
    when(isnan(x), lit(null)).otherwise(x)

  /** Blank / whitespace-only string sentinels → NULL (string half of the
    * reference's NaN normalization — pandas object columns). */
  def blankToNull(s: Column): Column =
    when(trim(s) === "", lit(null)).otherwise(s)

  /** A given sentinel value → NULL. */
  def sentinelToNull(s: Column, sentinel: String): Column =
    when(s === sentinel, lit(null)).otherwise(s)

  /** Wave number from the trailing two characters of the project name
    * (feeder.py:124-125: `project_name[-2:]`). */
  def waveFromName(name: Column): Column =
    substring(name, -2, 2).cast("int")

  /** The w6-variant derivation (feeder_w6.py:126:
    * `project_name[-2:].replace("w", "")`) — tolerates a `w` marker in
    * the trailing characters. */
  def waveFromNameLoose(name: Column): Column =
    regexp_replace(substring(name, -2, 2), "w", "").cast("int")
}
