package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Watermarked tumbling-window aggregation — the streaming twin of the batch
  * `q24_events_hourly` query: per (window, event_type) counts and value sums
  * over an event stream, finalized (Append mode) once the event-time
  * watermark passes the window end.
  *
  * Scale posture: the aggregation is a standard two-phase hash aggregate on
  * the shuffle key (window, event_type); state per open window is one row
  * per (window, event_type) — bounded by the watermark horizon, independent
  * of event volume. Late events beyond `watermarkDelay` are dropped exactly
  * as documented for append-mode watermarked aggregations.
  */
object EventAggStream {

  /** Aggregate a streaming events frame (`ts: timestamp, event_type: string,
    * value: double`) into tumbling windows.
    */
  def windowed(
      events: DataFrame,
      windowLength: String = "1 hour",
      watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value")).as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** @param trigger defaults to drain-the-backlog-and-stop (AvailableNow),
    *                 the incremental-batch production posture. CAVEAT of
    *                 append-mode watermarked aggregation under ANY
    *                 drain-and-stop trigger: windows whose end exceeds the
    *                 final watermark stay in state and are NOT emitted by
    *                 this run — with a durable checkpoint they finalize on
    *                 the next scheduled run; this memory-sink demo API has
    *                 no checkpoint, so the open tail window is simply
    *                 absent from the table. Pass
    *                 `Trigger.ProcessingTime(...)` for a continuously-live
    *                 query (tests over MemoryStream must: AvailableNow
    *                 terminates before `addData` can feed later batches).
    */
  def start(
      src: DataFrame,
      queryName: String = "event_windows",
      windowLength: String = "1 hour",
      watermarkDelay: String = "10 minutes",
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    windowed(src, windowLength, watermarkDelay)
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("append")
      .trigger(trigger)
      .start()
}
