package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join — "all build rows with the same key whose time
  * falls in a window before the probe row". Spark has no native range-join
  * strategy: `a.join(b, ts between ...)` plans as a BroadcastNestedLoopJoin
  * (or cartesian), the same scale-killer shape q37 had.
  *
  * Scalable formulation (composition, preference (a) of the build rules):
  * bucket time into `window`-sized chunks. A build row at time `tb` matches
  * a probe row at `tp` with `tb ∈ [tp - window, tp)` only if
  * `bucket(tb) ∈ {bucket(tp) - 1, bucket(tp)}` — integer floor division
  * guarantees exactly those two buckets cover the half-open window. So:
  * explode the PROBE side to its two covering buckets (bounded 2×, fixed at
  * plan time), equi-join on (key, bucket), and verify the exact interval as
  * a post-join filter. Each build row's bucket is single-valued, so a
  * matching pair meets on exactly one bucket — no dedup step.
  *
  * The join is a plain shuffle/broadcast HASH join on (key, bucket):
  * distributes by key at any scale, skew handled by AQE (or Salting) like
  * any equi-join.
  */
object RangeJoin {

  /** For each row of `probe`, all `build` rows with equal `key` and
    * event-time strictly before the probe's, within `windowUs` microseconds.
    * `ts` columns must be TimestampType. Output: probe row + build row's
    * columns prefixed `b_`.
    */
  def recentWithin(
      probe: DataFrame,
      build: DataFrame,
      key: String,
      ts: String,
      windowUs: Long): DataFrame = {
    require(windowUs > 0, "window must be positive")
    val pU = unix_micros(col(ts))
    val p = probe
      .withColumn("__pu", pU)
      .withColumn("__bucket",
        explode(array(floor(pU / windowUs) - 1, floor(pU / windowUs))))
    val bCols = build.columns.map(c => col(c).as(s"b_$c"))
    val b = build.select(bCols.toSeq: _*)
      .withColumn("__bu", unix_micros(col(s"b_$ts")))
      .withColumn("__bucket", floor(col("__bu") / windowUs))
    p.join(b,
        p(key) === b(s"b_$key") && p("__bucket") === b("__bucket") &&
          col("__bu") >= col("__pu") - windowUs && col("__bu") < col("__pu"))
      .drop("__bucket", "__pu", "__bu")
  }
}
