package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming vocabulary tracking: per-window top-k most frequent tokens of
  * a document stream, via the SpaceSaving heavy-hitters aggregate
  * ([[graft.functions.TopKFrequent]]) — the streaming twin of batch q63.
  *
  * Why this composes: a `TypedImperativeAggregate` carries its partial
  * state as a serialized buffer, so the streaming aggregation state per
  * open window is ONE capacity-bounded SpaceSaving summary (not a row per
  * token) and late-arriving batches merge into it through the same
  * `merge` path the batch shuffle uses. State ∝ open windows × capacity,
  * independent of vocabulary or stream volume — the property that makes a
  * live "what is the corpus saying right now" vocab tracker viable at
  * ingest scale. Windows finalize (append mode) when the watermark passes
  * their end; `err` in the emitted structs bounds any eviction-regime
  * overcount exactly as in batch.
  */
object TopTokensStream {

  /** Emitted rows: (window_start, top) where `top` is the sorted
    * `array<struct<token, cnt, err>>` for the finalized window.
    */
  def windowedTopTokens(
      docs: DataFrame,
      tsCol: String = "ts",
      textCol: String = "text",
      k: Int = 10,
      capacity: Int = 1024,
      windowLength: String = "1 minute",
      watermarkDelay: String = "10 minutes"): DataFrame =
    docs
      .withWatermark(tsCol, watermarkDelay)
      .select(col(tsCol), explode(split(col(textCol), " ", -1)).as("token"))
      .groupBy(window(col(tsCol), windowLength))
      .agg(graft.functions.SpaceSavingExpressions
        .topKFrequent(col("token"), k, capacity).as("top"))
      .select(col("window.start").as("window_start"), col("top"))

  def start(
      src: DataFrame,
      queryName: String = "top_tokens",
      tsCol: String = "ts",
      textCol: String = "text",
      k: Int = 10,
      capacity: Int = 1024,
      windowLength: String = "1 minute",
      watermarkDelay: String = "10 minutes",
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    windowedTopTokens(src, tsCol, textCol, k, capacity, windowLength, watermarkDelay)
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("append")
      .trigger(trigger)
      .start()
}
