package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SaveMode}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.queries.{Curation, Release}

/** Streaming ingestion INTO the pack manifest — the continuous form of the
  * continuation append (q159): each micro-batch plays the role of a "day"
  * and RESUMES the per-source token stream exactly where the persisted
  * manifest left it, the batch's first doc filling the last partial
  * context window. Published manifest rows are never rewritten: a batch
  * lands as new parquet files only (`SaveMode.Append`), so a training
  * loader already holding yesterday's spans sees them byte-stable.
  *
  * `foreachBatch` is the right sink shape (the ShardIngestStream
  * precedent): the append is a batch operation against the existing
  * layout, and Structured Streaming's sequential-epoch guarantee means
  * the read-offsets/append cycle never races itself. One deliberate
  * difference from the batch-side [[Release.packManifestAppend]]: the
  * per-source resume offsets (≤ n_sources rows) are COLLECTED before the
  * write starts, so the append plan never reads the directory it is
  * writing to — the parquet self-read hazard (a retried task observing
  * its own partial output) is severed by construction rather than by a
  * committer assumption. Restart semantics are the standard foreachBatch
  * file-sink contract: at-least-once on crash replay unless paired with a
  * downstream batch-id manifest check.
  *
  * The FIRST batch bootstraps the manifest via [[Release.packManifest]]
  * (there is no day-0 to resume from); every later batch appends spans.
  */
object PackIngestStream {

  def start(
      docs: DataFrame,
      storeDir: String,
      packTokens: Int = 512,
      queryName: String = "pack_ingest",
      checkpointDir: Option[String] = None,
      trigger: Trigger = Trigger.ProcessingTime(0),
      tombstonePath: Option[String] = None): StreamingQuery = {
    val writer = docs.writeStream
      .queryName(queryName)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          // forget guard at the front door (the MediaDedupStream shape):
          // forgotten docs must never enter future packs — the packs
          // already holding them are the takedown locator's job (q172)
          val b = tombstonePath.fold(batch.toDF())(p =>
            graft.pipeline.Forget.filterForgotten(s, batch.toDF(), p))
          if (tombstonePath.isEmpty || !b.isEmpty) {
          val bootstrapped = graft.ops.StoreSwap.committed(s, storeDir)
          if (!bootstrapped) {
            Release.packManifest(b, packTokens).write
              .mode(SaveMode.Overwrite).parquet(storeDir)
          } else {
            // bounded collect (one row per source) — materializes the
            // resume state so the span plan is store-independent
            val offsets = Release
              .packResumeOffsets(s.read.parquet(storeDir), packTokens)
              .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
            import s.implicits._
            val base = offsets.toDF("source", "base_off")
            Release.packSpans(b, base, packTokens).write
              .mode(SaveMode.Append).parquet(storeDir)
          }
          }
          ()
        }
      }
    checkpointDir.fold(writer)(d => writer.option("checkpointLocation", d)).start()
  }
}
