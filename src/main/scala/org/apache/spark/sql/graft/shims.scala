package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between custom Catalyst [[Expression]]s and the public [[Column]]
  * API. Spark 4 made the Column↔Expression converters `private[sql]`
  * (`classic.ExpressionUtils`), so this one-file shim lives inside the
  * `org.apache.spark.sql` package to re-export exactly the two conversions
  * custom expressions need. No Spark internals are modified.
  */
object shims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Rewrap a DataFrame's physical rows in a FRESH leaf plan with default
    * statistics. `Dataset.localCheckpoint` truncates lineage but carries
    * the pre-checkpoint plan's `sizeInBytes` into the new leaf — and join
    * estimation multiplies child sizes, so an ITERATIVE algorithm that
    * checkpoints every round compounds the estimate geometrically until
    * Catalyst spends minutes multiplying million-digit BigIntegers (see
    * [[graft.operators.ConnectedComponents]]). Re-wrapping the checkpointed
    * RDD through `internalCreateDataFrame` (private[sql]) produces a
    * LogicalRDD with the session-default size estimate instead — constant
    * per round, so iterated materialization stays O(1) in planning cost.
    * Call on an already-materialized (checkpointed) DataFrame; the RDD is
    * reused, no data is copied or recomputed.
    */
  def freshStats(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    ds.sparkSession.internalCreateDataFrame(ds.queryExecution.toRdd, ds.schema)
  }

  /** Rewrap a MATERIALIZED (checkpointed/persisted) DataFrame in a fresh
    * leaf carrying its TRUE storage size as the plan statistics. This is
    * [[freshStats]] upgraded from "default estimate" to "measured bytes":
    * with default stats every join against a checkpoint leaf plans as a
    * full shuffle (sort-merge), because default `sizeInBytes` is the
    * don't-broadcast sentinel — for an iterative operator that's 2+ extra
    * shuffle stages per round of pure latency. Measured bytes let the
    * planner make the SAME decision it would make for a parquet scan of
    * this data: broadcast when genuinely small, shuffle when genuinely
    * big — the scale-honest behavior at every SF. Falls back to default
    * stats when no persisted ancestor/size is found (e.g. not yet
    * materialized), which is never wrong, only slower.
    */
  def realStats(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    realStatsIn(df.sparkSession, df)

  /** [[realStats]] rewrapping into a TARGET session (which must share the
    * source's SparkContext — RDDs are context-scoped, not session-scoped).
    * This is how an iterative operator hands a materialized level across a
    * session boundary: compute under one session's conf, plan every later
    * read under another's. See [[graft.operators.ConnectedComponents]],
    * which isolates its loop-only conf overrides (AQE off, edge-sized
    * shuffle parallelism) in a cloned session so concurrent work on the
    * caller's session never plans under them.
    */
  def realStatsIn(
      target: org.apache.spark.sql.SparkSession,
      df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val session = target.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val rdd = ds.queryExecution.toRdd
    def persisted(r: org.apache.spark.rdd.RDD[_], depth: Int): Option[org.apache.spark.rdd.RDD[_]] =
      if (depth >= 8) None
      else if (r.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE) Some(r)
      else r.dependencies.iterator.flatMap(d => persisted(d.rdd, depth + 1)).take(1)
        .toList.headOption
    val stats = persisted(rdd, 0).flatMap { p =>
      session.sparkContext.getRDDStorageInfo.find(_.id == p.id).map { info =>
        org.apache.spark.sql.catalyst.plans.logical.Statistics(
          sizeInBytes = BigInt((info.memSize + info.diskSize).max(1L)))
      }
    }
    org.apache.spark.sql.classic.Dataset.ofRows(session,
      org.apache.spark.sql.execution.LogicalRDD(
        ds.queryExecution.analyzed.output, rdd,
        org.apache.spark.sql.catalyst.plans.physical.UnknownPartitioning(0),
        Nil, false, None)(session, stats, None))
  }

  /** An isolated twin of `session`: same SparkContext, cached data and
    * registered state (a full `cloneSession`, so extensions/UDFs/temp views
    * survive — unlike `newSession`, which resets runtime conf to defaults),
    * but an INDEPENDENT SQLConf. `cloneSession` is `private[sql]`, hence
    * the bridge. Operators that must override planning conf for a bounded
    * region (iterative loops) run their plans in a clone instead of
    * mutating the caller's session-global conf under concurrent work.
    */
  def cloneSession(
      session: org.apache.spark.sql.SparkSession): org.apache.spark.sql.SparkSession =
    session.asInstanceOf[org.apache.spark.sql.classic.SparkSession].cloneSession()

  /** Drop the storage blocks behind a `localCheckpoint`ed DataFrame (the
    * checkpoint RDD is otherwise freed only when the JVM GCs the RDD
    * object and the ContextCleaner notices). The plan's leaf RDD is
    * typically a projection OVER the persisted checkpoint RDD, so this
    * walks the narrow dependency chain up to the first persisted ancestor.
    * Iterative operators call it on superseded rounds so live blocks stay
    * bounded to one round; the unpersisted data is gone for good (local
    * checkpoints have no lineage to recompute from) — only call on
    * DataFrames nothing will read again. Safe no-op for non-checkpoint
    * plans.
    */
  def unpersistCheckpoint(df: org.apache.spark.sql.DataFrame): Unit = {
    def walk(rdd: org.apache.spark.rdd.RDD[_], depth: Int): Unit =
      if (depth < 8) {
        if (rdd.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE) {
          rdd.unpersist(false); ()
        } else rdd.dependencies.foreach(d => walk(d.rdd, depth + 1))
      }
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    ds.queryExecution.analyzed.foreach {
      case r: org.apache.spark.sql.execution.LogicalRDD => walk(r.rdd, 0)
      case _ => ()
    }
  }
}
