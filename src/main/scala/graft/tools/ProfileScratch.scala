package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway profiling harness (not part of the shipped surface). */
object ProfileScratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm
    spark.read.parquet(s"$dir/orders.parquet").groupBy("o_orderstatus").count().collect()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    (1 to 2).foreach { rep =>
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      println(s"--- rep $rep ---")
      time("q_corpus_build total") {
        val df = time("construct (incl. scans)") {
          graft.SparkEntry.queries("q_corpus_build")(spark, dir)
        }
        time("noop write")(df.write.mode("overwrite").format("noop").save())
      }
    }
    spark.stop()
  }
}
