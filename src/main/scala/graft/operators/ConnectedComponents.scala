package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list, as iterative min-label
  * propagation with pointer jumping — the operator that turns near-dup PAIRS
  * (q33/q34/q37) into dedup CLUSTERS: training pipelines drop whole clusters
  * (keep one canonical doc per component), not individual pairs.
  *
  * Algorithm: every node starts labeled with its own id; each round
  *   1. propagation — label(u) := min(label(u), min over neighbors v of
  *      label(v)) via one equi-join edges⋈labels + a min-aggregate, and
  *   2. pointer jumping — label(u) := label(label(u)) via a self-join
  *      (labels are node ids, so the current label table doubles as the
  *      lookup; path-halving is what makes convergence logarithmic rather
  *      than diameter-bounded).
  * Labels are monotonically non-increasing and bounded below by the
  * component minimum, so the fixpoint (no label changed in a full round) is
  * exactly label(u) = min id reachable from u.
  *
  * Scale shape: everything is equi-joins and min-aggregates on the node-id
  * key — no cartesians, no driver-side graph (the only driver actions are
  * the per-round empty-check and the lineage-truncating checkpoint). Rounds
  * are O(log n) thanks to jumping; each round shuffles O(|V| + |E|) rows of
  * two longs. `localCheckpoint` truncates the per-iteration plan growth that
  * would otherwise make round k re-execute rounds 1..k-1 (and eventually
  * OOM the driver on plan size alone); on a real cluster with lineage-based
  * recovery concerns, swap for reliable `checkpoint` — same call shape.
  *
  * Reference behavioral anchor: the near-dup surface this completes is the
  * SURVEY §2 LLM-pipeline extension (dedup beyond the reference's exact
  * converter scope).
  */
object ConnectedComponents {

  /** Labels every node in `nodes` (column `id`) with the minimum id
    * reachable through `edges` (columns `src`, `dst`; undirected, self-loops
    * and duplicates tolerated). Output: (id, component). Nodes absent from
    * every edge form singleton components labeled by themselves.
    *
    * @throws IllegalStateException if `maxIter` rounds do not reach the
    *         fixpoint (with jumping this needs ~log2(longest chain) rounds;
    *         20 covers any graph that fits on disk anywhere).
    */
  def run(nodes: DataFrame, edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val sym = edges
      .select(col("src").cast("long").as("u"), col("dst").cast("long").as("v"))
      .union(edges.select(col("dst").cast("long").as("u"), col("src").cast("long").as("v")))
      .localCheckpoint() // edge derivation (often a similarity join) runs once, not per round
    var labels = nodes.select(col("id").cast("long"), col("id").cast("long").as("lab"))
      .localCheckpoint()
    var round = 0
    var converged = false
    while (!converged && round < maxIter) {
      // checkpoint BEFORE the self-join below: the jump references this
      // subtree twice, and the rename defeats exchange reuse — without the
      // materialization the edge join + aggregate would run twice per round
      val propagated = sym
        .join(labels.withColumnRenamed("id", "u"), "u")
        .select(col("v").as("id"), col("lab"))
        .union(labels)
        .groupBy("id").agg(min("lab").as("lab"))
        .localCheckpoint()
      // jump: look the label up in the same table (labels ARE node ids and
      // every component minimum is a node — coalesce is belt-and-braces for
      // nodes missing from `nodes`)
      val jumped = propagated
        .join(
          propagated.select(col("id").as("lab"), col("lab").as("lab2")),
          Seq("lab"), "left")
        .select(col("id"), coalesce(col("lab2"), col("lab")).as("lab"))
        .localCheckpoint()
      converged = jumped.as("n")
        .join(labels.as("o"), "id")
        .filter(col("n.lab") =!= col("o.lab"))
        .isEmpty
      labels = jumped
      round += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter rounds")
    labels.select(col("id"), col("lab").as("component"))
  }
}
