package graft

import org.apache.spark.sql.functions._

/** q_k_anonymity, q_spearman, q_mann_whitney: exact driver replays on
  * sf0.001 plus structural identities (risk sums add up; |ρ| ≤ 1;
  * U₁ + U₂ = n₁·n₂). */
class KAnonRankTestsSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"
  private def q(key: String) = SparkEntry.queries(key)(spark, dir)

  test("k-anonymity violations match a driver replay; totals add up") {
    val classes = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_nationkey").cast("long"), col("c_mktsegment"),
        col("c_acctbal"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        math.floor(r.getDouble(2) / 1000.0).toLong))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nClasses = classes.size.toLong
    val atRisk = classes.values.filter(_ < 5).sum
    val expected = classes.collect { case ((nk, seg, band), n) if n < 5 =>
      (nk, seg, band, n, nClasses, atRisk)
    }.toSet
    val got = q("q_k_anonymity").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == expected && got.nonEmpty)
    got.foreach { case (_, _, _, n, _, risk) =>
      assert(n < 5 && risk == atRisk)
    }
  }

  /** (type, tie-broken rank pairs) replay shared by both rank tests. */
  private def eventRows() = {
    eventsTable(dir)
      .select(col("event_id"), col("event_type"), unix_micros(col("ts")).as("tus"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
  }

  test("spearman matches a driver replay; rho is a valid correlation") {
    val rows = eventRows()
    val ra = rows.sortBy(x => (x._2, x._3, x._1)).zipWithIndex
      .map { case (x, i) => x._1 -> (i + 1L) }.toMap
    val rb = rows.sortBy(x => (x._2, x._4, x._1)).zipWithIndex
      .map { case (x, i) => x._1 -> (i + 1L) }.toMap
    val expected = rows.groupBy(_._2).map { case (ty, xs) =>
      val n = BigInt(xs.length)
      val s = xs.map { x =>
        val d = BigInt(ra(x._1) - rb(x._1)); d * d
      }.sum
      val a = n * (n * n - 1)
      (ty, xs.length.toLong, s.toLong, ((a - 6 * s) * 1000000 / a).toLong)
    }.toSet
    val got = q("q_spearman").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected && got.nonEmpty)
    got.foreach { case (ty, _, _, rho) =>
      assert(rho.abs <= 1000000L, s"$ty: |rho_ppm|=$rho > 1e6")
    }
  }

  test("mann-whitney matches a driver replay; U1 + U2 = n1*n2") {
    val rows = eventRows()
    def wkend(us: Long): Boolean = ((us / 86400000000L + 3) % 7 + 1) >= 6
    val expected = rows.groupBy(_._2).map { case (ty, xs) =>
      val ranked = xs.sortBy(x => (x._4, x._1)).zipWithIndex
        .map { case (x, i) => (wkend(x._3), i + 1L) }
      val n1 = ranked.count(_._1).toLong
      val n2 = ranked.length - n1
      val r1 = ranked.collect { case (true, r) => BigInt(r) }.sum
      val u = (r1 - BigInt(n1) * (n1 + 1) / 2).toLong
      (ty, n1, n2, u)
    }.toSet
    val got = q("q_mann_whitney").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.map(x => (x._1, x._2, x._3, x._4)).toSet == expected
      && got.nonEmpty)
    // identity: U1 + U2 = n1*n2 (U2 from the mirrored rank sum)
    got.foreach { case (ty, n1, n2, u1, z) =>
      val r2 = BigInt(n1 + n2) * (n1 + n2 + 1) / 2 -
        (BigInt(u1) + BigInt(n1) * (n1 + 1) / 2)
      val u2 = r2 - BigInt(n2) * (n2 + 1) / 2
      assert(BigInt(u1) + u2 == BigInt(n1) * n2, s"$ty: U identity fails")
      assert(!z.isNaN, s"$ty: z is NaN")
    }
  }
}
