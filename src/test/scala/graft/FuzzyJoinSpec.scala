package graft

import org.apache.spark.sql.functions._

/** q_fuzzy_join: the segment-blocking recall guarantee (every probe
  * finds its source at distance exactly 1), verify-stage exactness, and
  * the equi-join plan shape. */
class FuzzyJoinSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"
  private def q() = SparkEntry.queries("q_fuzzy_join")(spark, dir)

  test("every probe recalls its source row at edit distance exactly 1") {
    val rows = q().collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val probeIds = spark.read.parquet(s"$dir/customer.parquet")
      .filter(col("c_custkey") % 10 === 0)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    assert(probeIds.nonEmpty)
    probeIds.foreach { id =>
      assert(rows.contains((id, id, 1)),
        s"probe $id must match its own source at dist 1")
    }
    rows.foreach { case (p, m, d) =>
      assert(d >= 0 && d <= 1)
      assert(probeIds.contains(p))
      assert(m >= 0)
    }
  }

  test("matches agree with a driver-side brute-force edit-distance scan") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val cust = spark.read.parquet(s"$dir/customer.parquet")
      .select("c_custkey", "c_name").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val probes = cust.filter(_._1 % 10 == 0).map { case (k, name) =>
      val pos = (10 + k % 8).toInt - 1 // 0-based
      val ch = (((name(pos) - '0') + 1) % 10 + '0').toChar
      k -> (name.substring(0, pos) + ch + name.substring(pos + 1))
    }
    val expect = (for {
      (pid, pname) <- probes
      (ck, cname) <- cust
      d = lev(pname, cname) if d <= 1
    } yield (pid, ck, d)).toSet
    val got = q().collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == expect,
      s"blocking must not lose any true match: missing ${expect -- got}, extra ${got -- expect}")
  }

  test("candidate generation is an equi-join on the blocking key, no cross join") {
    val plan = q().queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cross join:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"BNLJ:\n$plan")
  }
}
