package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.multimodal.Multimodal

/** Streaming MEDIA near-dup guard + absorb — the online form of the
  * incremental media trio (image q185, audio q186, video q187), closing
  * the last store family without a streaming operator: media arriving as
  * a feed of (doc_id, payload) rows is probed against the PERSISTED
  * fingerprint band index and then absorbed into it, so micro-batch N+1
  * automatically dedups against micro-batch N — the
  * [[ReleaseIngestStream]] probe-then-absorb shape at the media tier.
  *
  * Stream ≡ batch by CONSTRUCTION, not by re-derivation: each micro-batch
  * runs the exact batch operators (`incremental*Pairs` to probe,
  * `appendTo*Index` to absorb), so driving batches B1, B2 through the
  * stream leaves the index content-identical to two batch absorbs and
  * emits exactly `incremental(B1, idx)` ++ `incremental(B2, idx+B1)` —
  * the MediaDedupStreamSpec twin-store pin.
  *
  * Restart semantics (foreachBatch is at-least-once): effects are ordered
  * results-then-absorb with an idempotence story for each —
  *   - flagged pairs land at `resultsDir/batch=<id>` with Overwrite, so a
  *     replayed micro-batch rewrites its own directory byte-equivalently
  *     (the store it probes is unchanged — see next point — so the pairs
  *     recompute identically);
  *   - the index append is guarded by a store probe for the batch's own
  *     ids (the [[ReleaseIngestStream]] bandHasBatch discipline): a
  *     replay that finds the batch already absorbed skips BOTH the
  *     re-probe-write and the re-append, because a committed absorb
  *     implies the results write — sequenced strictly before it —
  *     committed too. For video the witness is the vcounts artifact,
  *     written SECOND inside [[Multimodal.appendToVideoIndex]]: its
  *     presence implies the band append committed, and a crash between
  *     the two writes double-appends band rows only, which probes
  *     `.distinct()` away (the dedup band-store argument) while the
  *     join-sensitive denominators never duplicate.
  *
  * Scale: each micro-batch decodes ITS OWN payloads partition-local,
  * shuffles 8-byte hashes + ids, and equi-joins the band-partitioned
  * store — the q185/q186/q187 cost model per batch; the stream adds no
  * state (every join is against the on-disk snapshot, and the guarded
  * append replaces watermarked bookkeeping).
  */
object MediaDedupStream {

  /** One modality's batch kernels, so the three starters share the
    * foreachBatch mechanics verbatim.
    */
  private final case class Kernel(
      probe: (SparkSession, DataFrame, String) => DataFrame,
      absorb: (DataFrame, String) => Unit,
      hasBatch: (SparkSession, DataFrame, String) => Boolean)

  /** Has this batch already been absorbed? Image/audio witness: any batch
    * id present in the single band artifact.
    */
  private def bandsHaveBatch(
      spark: SparkSession, batchIds: DataFrame, path: String): Boolean =
    spark.read.parquet(s"$path/dhbands").select(col("doc_id"))
      .join(broadcast(batchIds), Seq("doc_id"), "left_semi")
      .limit(1).count() > 0L

  /** Video witness: the vcounts artifact (written second in the absorb,
    * so its presence implies the band append committed).
    */
  private def vcountsHaveBatch(
      spark: SparkSession, batchIds: DataFrame, path: String): Boolean =
    spark.read.parquet(s"$path/vcounts").select(col("vid"))
      .join(broadcast(batchIds.select(col("doc_id").as("vid"))),
        Seq("vid"), "left_semi")
      .limit(1).count() > 0L

  private def image(maxHamming: Int) = Kernel(
    probe = (s, b, p) => Multimodal.incrementalDhashPairs(s, b, p, maxHamming),
    absorb = (b, p) => Multimodal.appendToDhashIndex(b, p),
    hasBatch = bandsHaveBatch)

  private def audio(maxHamming: Int) = Kernel(
    probe = (s, b, p) => Multimodal.incrementalAudioPairs(s, b, p, maxHamming),
    absorb = (b, p) => Multimodal.appendToAudioIndex(b, p),
    hasBatch = bandsHaveBatch)

  private def video(maxHamming: Int, minOverlap: Double) = Kernel(
    probe = (s, b, p) =>
      Multimodal.incrementalVideoPairs(s, b, p, maxHamming, minOverlap),
    absorb = (b, p) => Multimodal.appendToVideoIndex(b, p),
    hasBatch = vcountsHaveBatch)

  private def run(
      media: DataFrame,
      indexPath: String,
      resultsDir: String,
      kernel: Kernel,
      queryName: String,
      checkpointDir: Option[String],
      trigger: Trigger): StreamingQuery = {
    val writer = media.writeStream
      .queryName(queryName)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          val b = batch.toDF()
          if (!kernel.hasBatch(s, b.select(col("doc_id")), indexPath)) {
            kernel.probe(s, b, indexPath)
              .write.mode(SaveMode.Overwrite)
              .option("compression", "zstd")
              .parquet(s"$resultsDir/batch=$batchId")
            kernel.absorb(b, indexPath)
          }
        }
      }
    checkpointDir.fold(writer)(d => writer.option("checkpointLocation", d)).start()
  }

  /** Online q185: streamed images probe + absorb a persisted dHash index. */
  def startImage(
      media: DataFrame,
      indexPath: String,
      resultsDir: String,
      maxHamming: Int = 8,
      queryName: String = "media_dedup_image",
      checkpointDir: Option[String] = None,
      trigger: Trigger = Trigger.ProcessingTime(0)): StreamingQuery =
    run(media, indexPath, resultsDir, image(maxHamming), queryName,
      checkpointDir, trigger)

  /** Online q186: streamed WAVs probe + absorb a persisted audio index. */
  def startAudio(
      media: DataFrame,
      indexPath: String,
      resultsDir: String,
      maxHamming: Int = 6,
      queryName: String = "media_dedup_audio",
      checkpointDir: Option[String] = None,
      trigger: Trigger = Trigger.ProcessingTime(0)): StreamingQuery =
    run(media, indexPath, resultsDir, audio(maxHamming), queryName,
      checkpointDir, trigger)

  /** Online q187: streamed videos probe + absorb the frame index (bands +
    * vcounts denominators).
    */
  def startVideo(
      media: DataFrame,
      indexPath: String,
      resultsDir: String,
      maxHamming: Int = 8,
      minOverlap: Double = 0.5,
      queryName: String = "media_dedup_video",
      checkpointDir: Option[String] = None,
      trigger: Trigger = Trigger.ProcessingTime(0)): StreamingQuery =
    run(media, indexPath, resultsDir, video(maxHamming, minOverlap), queryName,
      checkpointDir, trigger)
}
