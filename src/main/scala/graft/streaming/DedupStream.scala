package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming exact deduplication — the streaming twin of the batch exact
  * dedup (q32): at-least-once upstream delivery (Kafka, file redelivery,
  * retried producers) is collapsed to exactly-once rows by key.
  *
  * `dropDuplicatesWithinWatermark` (not plain `dropDuplicates`) is the
  * 100 TB-viable form: plain streaming dropDuplicates keys state FOREVER
  * (state grows with every distinct key ever seen); the watermarked variant
  * evicts a key's state once the event-time watermark passes it, so state
  * is bounded by (arrival rate × watermark horizon) regardless of stream
  * lifetime. The trade: only duplicates arriving within the watermark delay
  * of each other are collapsed — exactly the delivery-retry window the
  * dedup is for.
  */
object DedupStream {

  /** Drop duplicate events by `idCols` arriving within the watermark delay.
    * `events` must carry an event-time column `ts`.
    */
  def dedup(
      events: DataFrame,
      idCols: Seq[String] = Seq("event_id"),
      watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(idCols.head, idCols.tail: _*)

  def start(
      src: DataFrame,
      queryName: String = "deduped",
      watermarkDelay: String = "10 minutes",
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    dedup(src, watermarkDelay = watermarkDelay)
      .select(col("event_id"), col("ts"))
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("append")
      .trigger(trigger)
      .start()
}
