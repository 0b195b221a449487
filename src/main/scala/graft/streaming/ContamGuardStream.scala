package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.functions.HashExpressions

/** Streaming train-contamination guard — the online form of the batch
  * cross-split audit (q82/q83): documents arriving as a feed are probed
  * against a STATIC train-window index and any doc sharing ≥1 word-k-gram
  * window with the training corpus is flagged (with its exact hit count)
  * before it can enter an eval set.
  *
  * This is the stream-STATIC join pattern — the one join shape the other
  * streaming operators don't cover (RangeJoinStream is stream-stream,
  * the bloom guard is a stateless filter). The static side is a plain
  * batch DataFrame (parquet-backed in production, the
  * [[graft.queries.Training.trainWindowHashes]] output): stream-static
  * inner joins are STATELESS — each micro-batch plans a fresh join against
  * the current static snapshot, no state store, no watermark needed for
  * the join itself. State appears only in the per-(window, doc) rollup
  * that re-aggregates exploded window hits into per-doc counts, bounded by
  * rate × (watermark + window) like every windowed aggregate here.
  *
  * At 100 TB the static side is the hashed window index (8-byte keys, the
  * q83 form) bucketed on `g`, so each micro-batch's join is a shuffle of
  * the BATCH only (small) against co-located index buckets — the batch
  * side never broadcasts the corpus-sized index.
  */
object ContamGuardStream {

  /** Flag streamed docs whose k-gram window hashes hit `trainWindows`
    * (a static distinct-`g` DataFrame). `docs` must carry `doc_id`, `ts`
    * (event time) and `text`. Emits (doc_id, n_hit) per finalized window;
    * clean docs (zero hits) are filtered by the inner join and never emit.
    */
  def guard(
      docs: DataFrame,
      trainWindows: DataFrame,
      k: Int = 5,
      watermarkDelay: String = "10 minutes",
      windowLength: String = "1 minute"): DataFrame =
    docs
      .withWatermark("ts", watermarkDelay)
      .select(col("doc_id"), col("ts"),
        explode(HashExpressions
          .shingleHashSet(split(col("text"), " ", -1), k)).as("g"))
      .join(trainWindows.select(col("g")), Seq("g")) // stream-static: stateless
      .groupBy(window(col("ts"), windowLength), col("doc_id"))
      .agg(count(lit(1)).as("n_hit"))
      .select(col("doc_id"), col("n_hit"))

  def start(
      docs: DataFrame,
      trainWindows: DataFrame,
      queryName: String = "contam_guard",
      k: Int = 5,
      watermarkDelay: String = "10 minutes",
      windowLength: String = "1 minute",
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    guard(docs, trainWindows, k, watermarkDelay, windowLength)
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("append")
      .trigger(trigger)
      .start()
}
