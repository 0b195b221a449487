package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SaveMode}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.queries.{Curation, Release}

/** Streaming ingestion into the BOUNDARY-pack manifest — the continuous
  * form of the bucket-grain continuation (q165), and
  * [[PackIngestStream]]'s no-crossing sibling: each micro-batch resumes
  * every (source, slot) bucket's numbering where the persisted manifest
  * stopped, the first batch doc of a partially-filled window taking its
  * next slot. Published rows are never rewritten — a batch lands as new
  * parquet files only.
  *
  * Same discipline as the token-stream ingester: the per-bucket resume
  * counts (≤ n_sources × n_slots rows) are COLLECTED before the write
  * starts, so the append plan never reads the directory it is writing
  * to; Structured Streaming's sequential-epoch guarantee keeps the
  * read-counts/append cycle from racing itself; restart semantics are
  * the standard foreachBatch at-least-once file-sink contract.
  *
  * The FIRST batch bootstraps via [[Release.boundaryPack]]; every later
  * batch appends [[Release.boundarySpans]].
  */
object BoundaryPackIngestStream {

  def start(
      docs: DataFrame,
      storeDir: String,
      budget: Int = 512,
      queryName: String = "boundary_pack_ingest",
      checkpointDir: Option[String] = None,
      trigger: Trigger = Trigger.ProcessingTime(0),
      tombstonePath: Option[String] = None): StreamingQuery = {
    val writer = docs.writeStream
      .queryName(queryName)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          // forget guard at the front door (the PackIngestStream clause)
          val b = tombstonePath.fold(batch.toDF())(p =>
            graft.pipeline.Forget.filterForgotten(s, batch.toDF(), p))
          if (tombstonePath.isEmpty || !b.isEmpty) {
          val bootstrapped = graft.ops.StoreSwap.committed(s, storeDir)
          if (!bootstrapped) {
            Release.boundaryPack(b, budget).write
              .mode(SaveMode.Overwrite).parquet(storeDir)
          } else {
            val counts = Release
              .boundaryResumeCounts(s.read.parquet(storeDir), budget)
              .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
            import s.implicits._
            Release.boundarySpans(
                b, counts.toDF("source", "bucket_slot", "base_rn"), budget)
              .write.mode(SaveMode.Append).parquet(storeDir)
          }
          }
          ()
        }
      }
    checkpointDir.fold(writer)(d => writer.option("checkpointLocation", d)).start()
  }
}
