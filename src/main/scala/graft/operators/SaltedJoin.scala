package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe shuffle join by key salting. A shuffled equi-join hashes
  * every fact row with the same key into ONE reducer task; a hot key
  * (the null-ish placeholder customer, the bot user with 10^9 events)
  * turns that task into the stage's straggler. Salting splits each hot
  * key's rows across `salt` reducers by appending a deterministic
  * per-row salt to the fact side and replicating the dim side `salt`
  * ways — the join result is IDENTICAL, the shuffle payload of the
  * fact side is unchanged, and the dim side grows ×salt (fine: salting
  * targets fact⋈dim shapes where the dim is orders of magnitude
  * smaller but too big — or too mutable — to broadcast).
  *
  * This is the manual form of AQE's skew-join split
  * (`spark.sql.adaptive.skewJoin.enabled`), which only kicks in past
  * its size thresholds and only for sort-merge joins; explicit salting
  * also covers shuffled-hash joins and keys known hot a priori.
  */
object SaltedJoin {

  /** Inner equi-join `fact(factKey) = dim(dimKey)` with the fact side
    * salted `salt` ways.
    *
    * @param saltFrom deterministic per-fact-row expression the salt is
    *                 hashed from (a row id — NOT the join key, which
    *                 would put the whole hot key back in one bucket)
    */
  def inner(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
            salt: Int, saltFrom: Column): DataFrame = {
    require(salt > 0, s"salt must be positive, got $salt")
    // loud failure beats silently overwriting-then-dropping a caller column
    require(!fact.columns.contains("__fsalt"), "fact already has a __fsalt column")
    require(!dim.columns.contains("__dsalt"), "dim already has a __dsalt column")
    val f = fact.withColumn("__fsalt", pmod(xxhash64(saltFrom), lit(salt.toLong)).cast("int"))
    val d = dim.withColumn("__dsalt", explode(sequence(lit(0), lit(salt - 1))))
    f.join(d, f(factKey) === d(dimKey) && f("__fsalt") === d("__dsalt"))
      .drop("__fsalt", "__dsalt")
  }
}
