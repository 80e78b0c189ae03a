package graft

import org.apache.spark.sql.functions._

/** q_corr_matrix: the one-pass exact-moment Pearson matrix must agree
  * with Spark's own streaming `corr` aggregate (an independent
  * algorithm) and keep the one-scan/one-aggregate plan shape. */
class CorrMatrixSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"
  private def q() = SparkEntry.queries("q_corr_matrix")(spark, dir)

  test("matches Spark's built-in corr within rounding") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_quantity").cast("decimal(18,2)").cast("double").as("q"),
        col("l_extendedprice").cast("decimal(18,2)").cast("double").as("p"),
        col("l_discount").cast("decimal(18,2)").cast("double").as("dc"))
    val expect = li.agg(corr(col("q"), col("p")).as("qp"),
      corr(col("q"), col("dc")).as("qd"),
      corr(col("p"), col("dc")).as("pd")).head()
    val got = q().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(math.abs(got(("l_quantity", "l_extendedprice")) - expect.getDouble(0)) < 1e-5)
    assert(math.abs(got(("l_quantity", "l_discount")) - expect.getDouble(1)) < 1e-5)
    assert(math.abs(got(("l_extendedprice", "l_discount")) - expect.getDouble(2)) < 1e-5)
  }

  test("every pair is reported once with |corr| <= 1 and the full row count") {
    val n = spark.read.parquet(s"$dir/lineitem.parquet").count()
    val rows = q().collect()
    assert(rows.length == 3)
    assert(rows.map(r => (r.getString(0), r.getString(1))).distinct.length == 3)
    rows.foreach { r =>
      assert(r.getLong(2) == n)
      assert(math.abs(r.getDouble(3)) <= 1.0)
    }
  }

  test("all moments come from ONE scan and ONE partial-aggregated job") {
    val plan = q().queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(plan).size == 1,
      s"moment matrix must not rescan per pair:\n$plan")
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      s"moments must aggregate map-side first:\n$plan")
  }
}
