package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling by key salting.
  *
  * AQE's skew-join split handles most runtime skew, but two shapes still
  * need explicit salting at 100 TB:
  *   - a shuffle JOIN where one key holds a double-digit percentage of the
  *     fact side (AQE splits partitions, but a single hot key still lands
  *     its entire build side in one task's hash table);
  *   - a shuffle AGGREGATION on a hot key (partial aggregation helps only
  *     when upstream partitions are many; a pre-shuffled hot key still
  *     funnels to one reducer).
  *
  * Both forms here are deterministic-result (the salt never leaks into the
  * output) and add exactly one narrow transform to each side.
  */
object Salting {

  /** Deterministic per-row salt: hash of the row content. `rand()` would
    * re-deal salts when a lost shuffle partition is recomputed (stage retry
    * / speculation), silently duplicating or dropping rows — a content hash
    * recomputes identically. Rows identical in EVERY hashable column share
    * a salt (they cannot be told apart by any deterministic function); hot
    * keys are spread because their non-key columns differ. Map-typed
    * columns are excluded (xxhash64 rejects MapType).
    */
  private def saltOf(df: DataFrame, salts: Int, saltCols: Seq[String]): Column = {
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => hashable(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
      case _ => true
    }
    val cols =
      if (saltCols.nonEmpty) saltCols.map(col)
      else df.schema.fields.filter(f => hashable(f.dataType)).map(f => col(f.name)).toSeq
    require(cols.nonEmpty, "no hashable columns to derive a deterministic salt from")
    pmod(xxhash64(cols: _*), lit(salts.toLong)).cast("int")
  }

  /** Equi-join `fact ⋈ dim` on `key`, with the fact side salted into
    * `salts` sub-keys and the dim side replicated `salts`×. The dim
    * replication bounds the memory of any one task's build side to
    * |dim rows for the key| regardless of fact-side skew.
    *
    * Supports "inner" and "left" (fact-preserving) joins.
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      salts: Int,
      joinType: String = "inner",
      saltCols: Seq[String] = Nil): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(Seq("inner", "left").contains(joinType), s"unsupported join type $joinType")
    val saltedFact = fact.withColumn("__salt", saltOf(fact, salts, saltCols))
    val repDim = dim.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedFact
      .join(repDim, saltedFact("__salt") === repDim("__salt") &&
        saltedFact(key) === repDim(key), joinType)
      .drop("__salt")
      .drop(repDim(key))
  }

  /** Two-phase salted aggregation: `groupBy(key)` with re-aggregable
    * aggregates (sum/count/min/max), computed as
    * `groupBy(key, salt) → partial` then `groupBy(key) → merge`. The first
    * shuffle spreads a hot key over `salts` reducers; the second moves only
    * `salts` rows per key.
    *
    * `partials` maps output column name → partial aggregate expression;
    * `merge` maps output column name → merge function over the partial col.
    *
    * `saltCols`: columns the deterministic salt hashes. Default (empty) =
    * every hashable column — always safe, but forces a full-width scan.
    * Pass a narrow high-cardinality subset (e.g. a unique id) to keep
    * parquet column pruning effective; determinism only needs the chosen
    * columns to be stable row content.
    */
  def saltedAgg(
      df: DataFrame,
      key: String,
      salts: Int,
      partials: Seq[(String, Column)],
      merge: String => Column => Column = n => c => sum(c).as(n),
      saltCols: Seq[String] = Nil): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(partials.nonEmpty, "at least one partial aggregate required")
    val salted = df.withColumn("__salt", saltOf(df, salts, saltCols))
    val partial = salted
      .groupBy(col(key), col("__salt"))
      .agg(partials.head._2.as(partials.head._1),
        partials.tail.map { case (n, c) => c.as(n) }: _*)
    partial
      .groupBy(col(key))
      .agg(
        merge(partials.head._1)(col(partials.head._1)),
        partials.tail.map { case (n, _) => merge(n)(col(n)) }: _*)
  }

  /** Convenience: salted `count(*)` and `sum(valueCol)` per key. */
  def saltedCountSum(df: DataFrame, key: String, valueCol: String, salts: Int = 16): DataFrame =
    saltedAgg(df, key, salts,
      Seq("n" -> count(lit(1)), "total" -> sum(col(valueCol))))
}
