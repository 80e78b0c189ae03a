package graft

/** q_mtbf, q_cold_start: driver-side replays of the round-10
  * reliability / recommender-coverage surface. */
class ReliabilityColdStartOpsSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.001"
  private def q(key: String) = SparkEntry.queries(key)(spark, dir)

  test("MTBF/MTTR replay; recovery gaps are positive") {
    val ev = eventsTable(dir)
      .selectExpr("user_id", "event_id", "unix_micros(ts) AS t",
        "event_type = 'error' AS e").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val errs = ev.filter(_._4)
    val mtbf = (errs.map(_._3).max - errs.map(_._3).min) /
      math.max(errs.length - 1, 1)
    var rt = BigInt(0); var unrec = 0L; var rec = 0L
    for ((u, xs) <- ev.groupBy(_._1)) {
      val sorted = xs.sortBy(x => (x._3, x._2))
      for (i <- sorted.indices if sorted(i)._4) {
        sorted.drop(i + 1).find(!_._4) match {
          case Some(nx) => rec += 1; rt += BigInt(nx._3 - sorted(i)._3)
          case None => unrec += 1
        }
      }
    }
    val r = q("q_mtbf").collect().head
    assert(r.getLong(0) == errs.length.toLong)
    assert(r.getLong(1) == mtbf, "mtbf_us")
    assert(r.getLong(2) == unrec, "n_unrecovered")
    assert(r.getLong(3) == (rt / BigInt(rec).max(1)).toLong, "mttr_us")
    assert(r.getLong(1) > 0L && r.getLong(3) > 0L)
  }

  test("cold-start coverage replays; planted clones are cold") {
    val mod = BigInt("36028797018963913")
    def planted(u: Long) =
      (BigInt(u) * BigInt("6364136223846793005") mod mod) % 32 == 0
    val raw = eventsTable(dir)
      .selectExpr("user_id", "event_type", "unix_micros(ts)").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val (t0, t1) = (raw.map(_._3).min, raw.map(_._3).max)
    val cut = t0 + (t1 - t0) * 3 / 4
    val base = raw.map(e => (e._1, e._2, e._3 < cut))
    val ev = base ++ base.filter(e => !e._3 && planted(e._1))
      .map(e => (e._1 + 1000000000L, e._2, e._3))
    val tr = ev.filter(_._3)
    val te = ev.filter(!_._3)
    val trU = tr.map(_._1).toSet
    val trUI = tr.map(e => (e._1, e._2)).toSet
    val teU = te.map(_._1).distinct
    val teUI = te.map(e => (e._1, e._2)).distinct
    assert(te.exists(e => e._1 > 1000000000L), "no planted clones")
    val coldU = teU.count(u => !trU(u)).toLong
    val coldUI = teUI.count(p => !trUI(p)).toLong
    val r = q("q_cold_start").collect().head
    assert(r.getLong(0) == teU.length.toLong && r.getLong(1) == coldU)
    assert(r.getLong(2) == coldU * 1000000L / math.max(teU.length, 1))
    assert(r.getLong(3) == teUI.length.toLong && r.getLong(4) == coldUI)
    assert(r.getLong(5) == coldUI * 1000000L / math.max(teUI.length, 1))
    // the planted clones guarantee the cold path fires
    assert(r.getLong(1) > 0L && r.getLong(4) > 0L,
      "cold counts zero despite planted test-only users")
    // pairs are at least as hard to cover as users
    assert(r.getLong(5) >= r.getLong(2),
      "pair cold rate below user cold rate — set algebra broken")
  }
}
