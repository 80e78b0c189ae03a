package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over a near-duplicate pair set — the step that
  * turns every dedup operator's PAIRS into usable CLUSTERS: each
  * document gets its component's minimum id as `cluster_id`, and the
  * row where `doc_id == cluster_id` is the canonical survivor a
  * training-data pipeline keeps.
  *
  * Algorithm: iterative min-label propagation. Each round every node
  * takes the minimum label among itself and its neighbours — one
  * symmetric equi-join plus one map-side-combinable min aggregation per
  * round, both hash-partitioned on the node id. Rounds needed = graph
  * diameter; near-dup components are shallow (duplicates of a common
  * source), so convergence is a handful of rounds. The loop stops as
  * soon as a round changes nothing (one cheap count per round) and
  * fails loudly at `maxIter` rather than returning half-merged
  * clusters. For adversarially deep graphs (long chains), the
  * alternating star-contraction family (Kiveris et al., "Connected
  * Components in MapReduce") converges in O(log n) rounds — this
  * implementation favors the shallow-component case the dedup surface
  * actually produces.
  *
  * Everything stays distributed: labels and edges shuffle on node id;
  * the driver sees only the per-round changed-row count.
  */
object ConnectedComponents {

  /** @param pairs undirected duplicate pairs (aCol, bCol) — ids of any
    *              integral type
    * @return (idCol, cluster_id): every node that appears in `pairs`,
    *         labeled with its component's minimum id */
  def minLabelPropagation(pairs: DataFrame, aCol: String, bCol: String,
                          idCol: String = "doc_id",
                          maxIter: Int = 50): DataFrame = {
    // Symmetrize MAP-SIDE (explode of both orientations), not via
    // union(fwd, rev): a union carries TWO copies of the upstream pair
    // plan, and when `pairs` is an LSH join pipeline the whole candidate
    // generation would execute twice before the persist materializes.
    // Pre-partitioning on __w means the per-round neighbour join reads
    // the persisted edges already hash-distributed on its join key — the
    // rounds shuffle only the (much smaller) label table.
    val edges = pairs
      .select(explode(array(
        struct(col(aCol).as("__v"), col(bCol).as("__w")),
        struct(col(bCol).as("__v"), col(aCol).as("__w")))).as("__e"))
      .select(col("__e.__v").as("__v"), col("__e.__w").as("__w"))
      .repartition(col("__w"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // localCheckpoint (eager) after every round: an iterative DataFrame
    // loop otherwise NESTS each round's plan inside the next — analysis
    // cost grows per round until tree operations overflow the stack.
    // Checkpointing materializes the round and resets the plan to a
    // leaf. (On a shared cluster where executor loss must be survivable,
    // swap for reliable checkpoint() on a checkpoint dir.)
    // init with min(self, neighbours) — one aggregation that resolves
    // size-2 components (the dominant dedup shape: one duplicate of one
    // source) outright, so they converge after a single propagation
    // round instead of two
    var labels = edges
      .select(col("__v"), least(col("__v"), col("__w")).as("__l"))
      .groupBy("__v").agg(min("__l").as("__l"))
      .localCheckpoint(true)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // neighbour labels flow along edges; keep the min per node. The
      // node's OWN previous label rides through the same aggregation
      // (tagged rows → conditional min), so the convergence check is a
      // scan of the checkpointed result — no per-round compare join.
      val self = labels.select(col("__v"), col("__l"), lit(true).as("__self"))
      val viaNeighbours = edges
        .join(labels.select(col("__v").as("__w"), col("__l")), Seq("__w"))
        .select(col("__v"), col("__l"), lit(false).as("__self"))
      val next = self.unionAll(viaNeighbours)
        .groupBy("__v")
        .agg(min("__l").as("__l"),
          min(when(col("__self"), col("__l"))).as("__prev"))
        .localCheckpoint(true)
      val changed = next.filter(col("__l") =!= col("__prev")).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      iter += 1
    }
    if (!converged) {
      // release cached blocks before failing — repeated failed calls in
      // a long-lived session must not accumulate storage
      edges.unpersist()
      labels.unpersist()
      throw new IllegalArgumentException(
        s"minLabelPropagation did not converge in $maxIter rounds — " +
          "component diameter exceeds the iteration budget")
    }
    edges.unpersist()
    labels.select(col("__v").as(idCol), col("__l").as("cluster_id"))
  }

  /** Cluster labels for EVERY document: paired docs get their component
    * minimum, unpaired docs are their own singleton cluster, and
    * `is_canonical` marks the one row per cluster a pipeline keeps. */
  def clusters(docs: DataFrame, pairs: DataFrame, idCol: String,
               aCol: String = "id_a", bCol: String = "id_b"): DataFrame = {
    val labeled = minLabelPropagation(pairs, aCol, bCol, idCol)
    docs.select(col(idCol))
      .join(labeled, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("cluster_id"), col(idCol)).as("cluster_id"))
      .withColumn("is_canonical", col(idCol) === col("cluster_id"))
  }
}
