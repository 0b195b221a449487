package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of [[graft.operators.RangeJoin]]: a stream-stream
  * inner join on key + event-time range, the Structured Streaming
  * "interval join" pattern.
  *
  * Unlike the batch case (where Spark would plan a nested-loop join and we
  * bucket by hand), stream-stream joins REQUIRE an equi-key plus a
  * time-range predicate — and the engine uses exactly that range to bound
  * its join state: with both sides watermarked and the build side
  * constrained to `[probe.ts - window, probe.ts)`, build-side state older
  * than `watermark - window` and probe-side state older than the watermark
  * are evicted. State is proportional to (rate × (window + watermark
  * delay)), independent of stream lifetime — the property that makes this
  * viable on an unbounded 100 TB/day stream.
  */
object RangeJoinStream {

  /** For each probe row, build rows with equal `key` whose `ts` lies in
    * `[probe.ts - windowSeconds, probe.ts)`. Build columns come back
    * prefixed `b_`. Both inputs must be streaming frames carrying an
    * event-time column `ts`.
    */
  def recentWithin(
      probe: DataFrame,
      build: DataFrame,
      key: String,
      ts: String,
      windowSeconds: Long,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    require(windowSeconds > 0, "window must be positive")
    val b = build.select(build.columns.map(c => col(c).as(s"b_$c")).toSeq: _*)
      .withWatermark(s"b_$ts", watermarkDelay)
    probe.withWatermark(ts, watermarkDelay)
      .join(b,
        col(s"b_$key") === col(key) &&
          col(s"b_$ts") >= col(ts) - expr(s"INTERVAL $windowSeconds SECONDS") &&
          col(s"b_$ts") < col(ts))
  }
}
