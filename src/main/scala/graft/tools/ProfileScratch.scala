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
    if (sys.env.contains("PROF_EDGES")) {
      import org.apache.spark.sql.functions._
      (1 to 2).foreach { rep =>
        println(s"--- edges rep $rep ---")
        val grouped = time("groupBy collect_set") {
          val d = spark.read.parquet(s"$dir/lineitem.parquet")
            .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
            .groupBy("ok").agg(sort_array(collect_set(col("pk"))).as("ps"))
            .persist()
          d.count(); d
        }
        val pairs = time("explode pairs count") {
          val p = grouped.select(explode(expr(
            """flatten(transform(ps, (x, i) ->
              |  transform(slice(ps, i + 2, size(ps)),
              |            y -> struct(x AS ea, y AS eb))))"""
              .stripMargin.replace("\n", " "))).as("e"))
            .select(col("e.ea").as("ea"), col("e.eb").as("eb"))
          println("pairs=" + p.count()); p
        }
        val edges = time("groupBy n_co filter") {
          val e = pairs.groupBy("ea", "eb").agg(count(lit(1)).as("n_co"))
            .filter(col("n_co") >= 2).select("ea", "eb").persist()
          println("edges=" + e.count()); e
        }
        time("deg") {
          val deg = edges.select(col("ea").as("v"))
            .unionAll(edges.select(col("eb").as("v")))
            .groupBy("v").agg(count(lit(1)).as("deg"))
          println("nodes=" + deg.count())
        }
        grouped.unpersist(); edges.unpersist()
      }
      spark.stop(); return
    }
    val names = args.headOption.getOrElse("q_corpus_build").split(",").toSeq
    names.foreach { name =>
      (1 to 2).foreach { rep =>
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
        println(s"--- $name rep $rep ---")
        time(s"$name total") {
          val df = time("construct (incl. scans)") {
            graft.SparkEntry.queries(name)(spark, dir)
          }
          if (sys.env.contains("PROF_EXPLAIN") && rep == 1) df.explain("formatted")
          time("noop write")(df.write.mode("overwrite").format("noop").save())
        }
      }
    }
    spark.stop()
  }
}
