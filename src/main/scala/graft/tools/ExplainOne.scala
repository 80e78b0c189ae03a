package graft.tools

import org.apache.spark.sql.execution.ExplainMode

import graft.SparkEntry

/** Targeted plan dump for scale debugging: formatted plan of the named
  * queries against an arbitrary sfDir (stats come from file sizes, so
  * the sf100 planner decisions — SHJ build sides, broadcast choices —
  * are visible without executing anything).
  *
  *   ExplainOne <sfDir> <q_a,q_b,...>
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val keys = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val spark = graft.GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"),
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    keys.foreach { k =>
      println(s"\n===== $k =====")
      try println(SparkEntry.queries(k)(spark, dir)
        .queryExecution.explainString(ExplainMode.fromString("formatted")))
      catch { case e: Throwable => println(s"EXPLAIN FAILED: ${e.getMessage}") }
    }
    spark.stop()
  }
}
