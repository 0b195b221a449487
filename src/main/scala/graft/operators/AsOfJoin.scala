package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** As-of join (point-in-time lookup), an operator Spark lacks natively.
  *
  * Implemented by composition (preference (a) of the build rules): tag both
  * sides, UNION them, and take `last(ignoreNulls)` over a per-key window
  * ordered by (time, tiebreak) with frame `[unboundedPreceding, -1]`. This is
  * the scalable formulation — ONE shuffle on the join key, per-partition
  * sort, no per-key loops, no broadcast requirement on either side — and it
  * degrades gracefully under skew via AQE because it is a plain window over
  * a union, not an actual join.
  *
  * Ties: "prior" means strictly earlier in the total order (time, tiebreak),
  * so two rows at the same timestamp are ordered by the tiebreak column —
  * deterministic on both engines.
  */
object AsOfJoin {

  /** General as-of: for each row of `probe`, the most recent `build` row with
    * the same `key` and (time, tiebreak) strictly before the probe row's.
    * Returns `probe.*` + `asof_<valueCol>`.
    */
  def asOf(
      probe: DataFrame,
      build: DataFrame,
      key: String,
      time: String,
      tiebreak: String,
      valueCol: String): DataFrame = {

    val p = probe.withColumn("__side", lit(1))
      .withColumn("__v", lit(null).cast(build.schema(valueCol).dataType))
    val b = build.select(
        col(key), col(time), col(tiebreak),
        lit(0).as("__side"), col(valueCol).as("__v"))
    val probeCols = probe.columns.map(col)

    val u = p.select((col(key) +: col(time) +: col(tiebreak) +: col("__side") +: col("__v") +:
      probe.columns.filterNot(Set(key, time, tiebreak)).map(col)).toSeq: _*)
      .unionByName(b, allowMissingColumns = true)

    // probe rows (__side 1) sort BEFORE build rows (__side 0) at identical
    // (time, tiebreak), so an exactly-tied build row falls outside the
    // [unboundedPreceding, -1] frame — "prior" stays strictly-before even
    // at exact ties.
    val w = Window.partitionBy(key)
      .orderBy(col(time).asc, col(tiebreak).asc, col("__side").desc)
      .rowsBetween(Window.unboundedPreceding, -1)

    u.withColumn(s"asof_$valueCol", last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((probeCols :+ col(s"asof_$valueCol")).toSeq: _*)
  }

  /** Specialized single-table form used by q26: for each `probeType` event,
    * the event_id of the latest strictly-prior `matchType` event by the same
    * user (order = (ts, event_id)).
    * Output: (event_id, user_id, last_click_id).
    */
  def lastPriorEvent(
      events: DataFrame,
      matchType: String,
      probeType: String): DataFrame = {

    val u = events
      .filter(col("event_type").isin(matchType, probeType))
      .select(
        col("user_id"), col("ts"), col("event_id"), col("event_type"),
        when(col("event_type") === matchType, col("event_id")).as("click_id"))

    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)

    u.withColumn("last_click_id", last(col("click_id"), ignoreNulls = true).over(w))
      .filter(col("event_type") === probeType)
      .select("event_id", "user_id", "last_click_id")
  }
}
