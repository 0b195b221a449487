package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over an undirected edge list, as iterative min-label
  * propagation with pointer chasing — the operator that turns near-dup PAIRS
  * (q33/q34/q37) into dedup CLUSTERS: training pipelines drop whole clusters
  * (keep one canonical doc per component), not individual pairs.
  *
  * Algorithm: every node starts labeled with `min(id, min neighbor id)`
  * (round-1 propagation fused into initialization); each round
  *   1. propagation — label(u) := min(label(u), min over neighbors v of
  *      label(v)) via one equi-join edges⋈labels + a min-aggregate, and
  *   2. pointer chase — label(u) := label^k(u), k lazy self-lookups of the
  *      propagated table (labels are node ids, so it doubles as the lookup;
  *      multi-step path compression is what keeps the round count low on
  *      chain-shaped components).
  * Labels are monotonically non-increasing and bounded below by the
  * component minimum, so the fixpoint (no label changed in a full round) is
  * exactly label(u) = min id reachable from u.
  *
  * Scale shape: everything is equi-joins and min-aggregates on the node-id
  * key — no cartesians, no driver-side graph (the only driver actions are
  * the per-round materialization and empty-check). Each round shuffles
  * O(|V| + |E|) rows of two longs.
  *
  * Why `persist` and NOT `localCheckpoint` for the loop state: Spark's
  * localCheckpoint carries the pre-checkpoint plan's `sizeInBytes` estimate
  * into the new leaf, and join estimation MULTIPLIES child sizes — so
  * iterated checkpoints compound the estimate geometrically (~5x per round
  * here). By round ~8 the BigInt byte-size estimate has millions of digits
  * and Catalyst spends minutes in BigInteger.multiply inside stats
  * estimation (measured: rounds 0-5 at ~1 s, round 7 at 15 s, round 8 at
  * 77 s). A persisted `InMemoryRelation` instead reports the REAL cached
  * byte size, resetting the compounding every round; superseded levels are
  * unpersisted as the loop advances and the converged result is copied out
  * through one final checkpoint so no cache outlives the call.
  */
object ConnectedComponents {

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
    // The symmetrized view stays lazy — re-scanning the cache is cheap.
    val ep = edges
      .select(col("src").cast("long").as("u"), col("dst").cast("long").as("v"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    ep.count()
    val sym = ep.union(ep.select(col("v").as("u"), col("u").as("v")))
    // round-1 propagation fused into initialization: from identity labels,
    // one propagation step IS min(id, min neighbor id) — one agg+join pass,
    // no union (least() skips the null of edgeless nodes). Iterative jobs
    // are action-latency-bound, so one round saved is measurable.
    var labels = nodes.select(col("id").cast("long"))
      .join(
        sym.groupBy("u").agg(min("v").as("mn")).withColumnRenamed("u", "id"),
        Seq("id"), "left")
      .select(col("id"), least(col("id"), col("mn")).as("lab"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    labels.count()
    var prevLevel = labels
    var round = 0
    var converged = false
    while (!converged && round < maxIter) {
      // materialize BEFORE the pointer chase below: the chase references
      // this subtree several times, and the rename defeats exchange reuse —
      // without the materialization the edge join + aggregate would run
      // once per chase step instead of once per round
      val propagated = sym
        .join(labels.withColumnRenamed("id", "u"), "u")
        .select(col("v").as("id"), col("lab"))
        .union(labels)
        .groupBy("id").agg(min("lab").as("lab"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      // pointer chase: follow label→label-of-label pointers three steps,
      // all lazily against the one cached table (labels ARE node ids, so
      // `propagated` doubles as the lookup). Measured on the sf0.1 near-dup
      // graph (2000 nodes / 920 pairs): 10 rounds with a single jump, ~4
      // with the 3-step chase. The left join cannot miss (every label is a
      // node); coalesce is belt-and-braces for nodes absent from `nodes`.
      val lookup = propagated.select(col("id").as("__k"), col("lab").as("__v"))
      val chased = (1 to 3).foldLeft(propagated: DataFrame) { (acc, _) =>
        acc.as("c").join(lookup, col("c.lab") === col("__k"), "left")
          .select(col("c.id").as("id"), coalesce(col("__v"), col("c.lab")).as("lab"))
      }
      // the changed-vs-previous flag rides in the SAME plan so convergence
      // needs only a scan of this cached level, not a separate join job
      val next = chased
        .join(labels.select(col("id"), col("lab").as("__prev")), "id")
        .select(col("id"), col("lab"), (col("lab") =!= col("__prev")).as("__changed"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      next.count()
      converged = next.filter(col("__changed")).isEmpty
      propagated.unpersist(false)
      prevLevel.unpersist(false)
      labels = next.select("id", "lab")
      prevLevel = next
      round += 1
    }
    if (!converged) {
      prevLevel.unpersist(false)
      ep.unpersist(false)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter rounds")
    }
    // copy the converged labels out of the cache (one checkpoint — the
    // stats carryover documented above is harmless when not iterated) so
    // every internal cache can be released before returning
    val out = labels.select(col("id"), col("lab").as("component")).localCheckpoint()
    prevLevel.unpersist(false)
    ep.unpersist(false)
    out
  }
}
