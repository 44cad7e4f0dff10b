package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair graph — the step that
  * turns pairwise dedup output (x03/x05-style `(ida, idb)` candidates)
  * into per-document CLUSTER assignments, so a pipeline can keep one
  * canonical representative per duplicate cluster instead of reasoning
  * about pairs. (The reference has no graph operators; this is an M4
  * pipeline extension, SURVEY §7.2.)
  *
  * Algorithm: iterative min-label propagation (labels start as the node
  * id; each round every node takes the min of its own and its neighbors'
  * labels) — converges in O(graph diameter) rounds. Near-dup clusters are
  * near-cliques (similarity is approximately transitive), so the diameter
  * is small in practice; a `maxIter` guard catches pathological chains.
  *
  * Scale design:
  *  - the symmetric edge list is localCheckpoint()ed ONCE and re-joined
  *    each round — no lineage growth, no recompute of the upstream LSH;
  *  - each round is one shuffled join + one partial-aggregated groupBy
  *    (min is map-side combinable), both AQE-skew-splittable;
  *  - convergence is checked with a single count over the label diff —
  *    no collect of node sets to the driver.
  */
object Components {

  /** `pairs`: two id columns (any orderable type). Returns (id, comp)
    * where comp = min node id of the component; only nodes present in
    * `pairs` appear. */
  def connectedComponents(pairs: DataFrame, aCol: String = "ida",
                          bCol: String = "idb", maxIter: Int = 50): DataFrame = {
    val fwd = pairs.select(col(aCol).as("s"), col(bCol).as("d"))
    val rev = pairs.select(col(bCol).as("s"), col(aCol).as("d"))
    val edges = fwd.union(rev).distinct().localCheckpoint()

    var labels = edges.select(col("s").as("id")).distinct()
      .withColumn("comp", col("id")).localCheckpoint()
    var i = 0
    var converged = false
    while (!converged) {
      i += 1
      if (i > maxIter) throw new IllegalStateException(
        s"connectedComponents did not converge within $maxIter rounds " +
          "(graph diameter exceeds the bound — raise maxIter)")
      // min label among neighbors, then min with the node's own label.
      // The `changed` flag rides along in the SAME pass, so convergence is
      // a scan of the just-checkpointed step — not a second labels-vs-next
      // shuffle join per iteration (round-8: halves per-round shuffles)
      val viaNeighbors = edges
        .join(labels.select(col("id").as("d"), col("comp").as("nc")), "d")
        .groupBy(col("s").as("id")).agg(min(col("nc")).as("nc"))
      val stepped = labels.join(viaNeighbors, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("nc"), col("comp"))).as("comp"),
          (coalesce(col("nc"), col("comp")) < col("comp")).as("changed"))
        .localCheckpoint()
      converged = stepped.where(col("changed")).isEmpty
      labels = stepped.select(col("id"), col("comp"))
    }
    labels
  }

  /** One row per duplicate cluster: the canonical (min-id) representative
    * plus the cluster size — the "keep list" of cluster-level dedup. */
  def representatives(pairs: DataFrame, aCol: String = "ida",
                      bCol: String = "idb"): DataFrame =
    connectedComponents(pairs, aCol, bCol)
      .groupBy(col("comp").as("keep_id"))
      .agg(count(lit(1)).as("cluster_size"))

  /** Cluster-level dedup of `df`: drop every row whose id sits in a
    * duplicate cluster but is not the cluster's min-id representative.
    * Rows not mentioned in `pairs` are kept (singleton clusters). */
  def dedupByCluster(df: DataFrame, pairs: DataFrame, idCol: String): DataFrame = {
    val losers = connectedComponents(pairs)
      .where(col("id") =!= col("comp"))
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }
}
