package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list, as iterative min-label
  * propagation with pointer chasing — the operator that turns near-dup PAIRS
  * (q33/q34/q37) into dedup CLUSTERS: training pipelines drop whole clusters
  * (keep one canonical doc per component), not individual pairs.
  *
  * Algorithm: every node starts labeled with `min(id, min neighbor id)`
  * (round-1 propagation fused into initialization); each round
  *   1. propagation — label(u) := min(label(u), min over neighbors v of
  *      label(v)) via one equi-join edges⋈labels + a min-aggregate, and
  *   2. pointer chase — label(u) := label³(u), three lazy self-lookups of
  *      the propagated table (labels are node ids, so it doubles as the
  *      lookup; multi-step path compression is what keeps the round count
  *      low on chain-shaped components — measured on the sf0.1 near-dup
  *      graph, 2000 nodes / 920 pairs: 10 rounds single-lookup, ~4 chased).
  * Labels are monotonically non-increasing and bounded below by the
  * component minimum, so the fixpoint (no label changed in a full round) is
  * exactly label(u) = min id reachable from u.
  *
  * Scale shape: everything is equi-joins and min-aggregates on the node-id
  * key — no cartesians, no driver-side graph (the only driver actions are
  * the per-round materialization and empty-check). Each round shuffles
  * O(|V| + |E|) rows of two longs.
  *
  * Iterative-loop materialization is SUBTLE in Spark, and both naive forms
  * fail at round ~7 (measured):
  *   - `localCheckpoint` alone truncates the plan but CARRIES the old
  *     plan's `sizeInBytes` into the new leaf; join estimation multiplies
  *     child sizes, so iterated checkpoints compound the estimate ~5x per
  *     round until Catalyst spends minutes in BigInteger.multiply inside
  *     stats estimation (rounds 0-5 ~1 s, round 7 15 s, round 8 77 s);
  *   - `persist` alone reports real cached sizes but does NOT truncate the
  *     analyzed plan, which grows ~6x per round (the chase references the
  *     round table four times) until plan analysis/rendering OOMs the
  *     driver.
  * [[snap]] does both halves right: checkpoint to truncate lineage, then
  * rewrap the materialized RDD in a fresh leaf with DEFAULT stats
  * (shims.freshStats) — constant plan size AND constant planning cost per
  * round. On a real cluster swap the localCheckpoint inside for reliable
  * `checkpoint` if lineage-free recovery is required.
  */
object ConnectedComponents {

  /** Materialize + truncate lineage + reset carried stats (see class doc). */
  private def snap(df: DataFrame): DataFrame =
    org.apache.spark.sql.graft.shims.freshStats(df.localCheckpoint())

  /** Labels every node in `nodes` (column `id`) with the minimum id
    * reachable through `edges` (columns `src`, `dst`; undirected, self-loops
    * and duplicates tolerated). Output: (id, component). Nodes absent from
    * every edge form singleton components labeled by themselves.
    *
    * @throws IllegalStateException if `maxIter` rounds do not reach the
    *         fixpoint (propagation + 3-step chase advances a chain several
    *         positions per round; 20 rounds covers any realistically
    *         clustered near-dup graph — raise it for pathological chains).
    */
  def run(nodes: DataFrame, edges: DataFrame, maxIter: Int = 20): DataFrame = {
    // materialize the DIRECTED edge list BEFORE symmetrizing: the union
    // below references it twice, and without materialization the edge
    // derivation (often an expensive similarity join) would execute twice.
    // The symmetrized view stays lazy — re-scanning a checkpoint is cheap.
    val ep = snap(edges
      .select(col("src").cast("long").as("u"), col("dst").cast("long").as("v")))
    val sym = ep.union(ep.select(col("v").as("u"), col("u").as("v")))
    // round-1 propagation fused into initialization: from identity labels,
    // one propagation step IS min(id, min neighbor id) — one agg+join pass,
    // no union (least() skips the null of edgeless nodes). Iterative jobs
    // are action-latency-bound, so one round saved is measurable.
    var labels = snap(nodes.select(col("id").cast("long"))
      .join(
        sym.groupBy("u").agg(min("v").as("mn")).withColumnRenamed("u", "id"),
        Seq("id"), "left")
      .select(col("id"), least(col("id"), col("mn")).as("lab")))
    var round = 0
    var converged = false
    var prevRound: Option[(DataFrame, DataFrame)] = None
    def free(df: DataFrame): Unit =
      org.apache.spark.sql.graft.shims.unpersistCheckpoint(df)
    var done = false
    try {
      while (!converged && round < maxIter) {
        // materialize BEFORE the pointer chase below: the chase references
        // this subtree four times, and the rename defeats exchange reuse —
        // without the materialization the edge join + aggregate would run
        // once per chase step instead of once per round
        val propagated = snap(sym
          .join(labels.withColumnRenamed("id", "u"), "u")
          .select(col("v").as("id"), col("lab"))
          .union(labels)
          .groupBy("id").agg(min("lab").as("lab")))
        // pointer chase: three lazy lookups against the one materialized
        // table. The left join cannot miss (every label is a node id);
        // coalesce is belt-and-braces for nodes absent from `nodes`.
        val lookup = propagated.select(col("id").as("__k"), col("lab").as("__v"))
        val chased = (1 to 3).foldLeft(propagated) { (acc, _) =>
          acc.as("c").join(lookup, col("c.lab") === col("__k"), "left")
            .select(col("c.id").as("id"), coalesce(col("__v"), col("c.lab")).as("lab"))
        }
        // the changed-vs-previous flag rides in the SAME plan so convergence
        // needs only a scan of this round's materialization, not a join job
        val next = snap(chased
          .join(labels.select(col("id"), col("lab").as("__prev")), "id")
          .select(col("id"), col("lab"), (col("lab") =!= col("__prev")).as("__changed")))
        converged = next.filter(col("__changed")).isEmpty
        // superseded snapshots are dead — drop their checkpoint blocks now
        // instead of waiting for GC + ContextCleaner (at scale each round's
        // labels are |V| rows of storage; only one round should be live).
        // The PREVIOUS round's labels were still read by this round's plan,
        // so each level is released exactly one round after it was built.
        prevRound.foreach { case (a, b) => free(a); free(b) }
        prevRound = Some((propagated, labels))
        labels = next.select("id", "lab")
        round += 1
      }
      if (!converged)
        throw new IllegalStateException(
          s"connected components did not converge in $maxIter rounds")
      done = true
      labels.select(col("id"), col("lab").as("component"))
    } finally {
      // everything except the returned final level is dead on BOTH paths:
      // the edge checkpoint (usually the largest artifact, O(|E|) rows),
      // the last round's propagated snapshot, and its input level. On the
      // failure path the final labels level is dead too.
      prevRound.foreach { case (a, b) => free(a); free(b) }
      free(ep)
      if (!done) free(labels)
    }
  }
}
