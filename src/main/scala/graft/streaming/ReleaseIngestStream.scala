package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.queries.Dedup
import graft.ops.ShardExport

/** Streaming ingestion into a PUBLISHED RELEASE — the continuous form of
  * the incremental release (q169), and the top of the ingest stack: each
  * micro-batch is deduplicated against the persisted band/component store
  * (the q112 incremental manifest, O(batch) probe work), NEW keepers are
  * appended as tail packs/shards under q120's offset rule, and keepers
  * DEMOTED by the batch are revoked by an appended TOMBSTONE row at their
  * immutable published address (the delta-log move: released files are
  * never rewritten, the loader masks by `doc_id NOT IN revoked`). The
  * live view at any instant is `published rows LEFT ANTI tombstones`.
  *
  * Discipline shared with [[PackIngestStream]]/[[BoundaryPackIngestStream]]:
  * everything the append plan needs from the directories it will mutate is
  * COLLECTED first — and every such artifact is bounded: additions ⊆ batch
  * (ranking over a union is the max of the maxima — q169's argument, so a
  * previously demoted doc can never re-win), demotions are bounded by the
  * batch-touched clusters, pack offsets are ≤ n_sources rows, the shard
  * base is 1 row. The corpus-sized band/manifest stores are only ever
  * SCANNED by distributed plans (the q110/q112 broadcast-gated shapes) and
  * mutated write-aside-then-swap, after the release append. Restart
  * semantics are the standard foreachBatch at-least-once file-sink
  * contract.
  *
  * The FIRST batch bootstraps: band index + component manifest built over
  * the batch, every keeper published from pack/shard zero.
  */
object ReleaseIngestStream {

  def start(
      docs: DataFrame,
      indexDir: String,
      releaseDir: String,
      threshold: Double = 0.7,
      packTokens: Int = 512,
      shardTokens: Int = 2048,
      queryName: String = "release_ingest",
      checkpointDir: Option[String] = None,
      trigger: Trigger = Trigger.ProcessingTime(0)): StreamingQuery = {
    val writer = docs.writeStream
      .queryName(queryName)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        if (!batch.isEmpty) ingest(batch.toDF(), indexDir, releaseDir,
          threshold, packTokens, shardTokens)
      }
    checkpointDir.fold(writer)(d => writer.option("checkpointLocation", d)).start()
  }

  /** One micro-batch absorbed — also the BATCH path a daily scheduler
    * would call directly against the same stores.
    */
  def ingest(
      batch: DataFrame,
      indexDir: String,
      releaseDir: String,
      threshold: Double = 0.7,
      packTokens: Int = 512,
      shardTokens: Int = 2048): Unit = {
    val s = batch.sparkSession
    val b = batch.withColumn("n_chars", length(col("text")).cast("long"))
    val sub = Dedup.manifestSubdir(indexDir, threshold)
    val bootstrapped = java.nio.file.Files
      .exists(java.nio.file.Paths.get(sub, "_SUCCESS"))
    if (!bootstrapped) {
      Dedup.persistBandIndex(b, indexDir)
      Dedup.persistComponents(b, indexDir, threshold)
      val keep = s.read.parquet(sub)
        .filter(col("keep") === 1).select(col("doc_id"))
      releaseRows(b.join(keep, Seq("doc_id"), "left_semi"),
          packBases = Nil, shardBase = 0L, packTokens, shardTokens)
        .write.mode(SaveMode.Overwrite)
        .option("compression", "zstd").parquet(releaseDir)
    } else {
      import s.implicits._
      // the day-N+1 manifest, write-aside (its plan reads the live store
      // and the band index — nothing is mutated until it is on disk)
      val next = sub + ".next"
      val docsLite = s.read.parquet(sub).select(col("doc_id"), col("n_chars"))
        .unionByName(b.select(col("doc_id"), col("n_chars")))
      Dedup.incrementalManifest(s, b, docsLite, indexDir, threshold)
        .select(col("doc_id"), col("cluster_id").as("component"),
          col("n_chars"), col("keep"))
        .write.mode(SaveMode.Overwrite)
        .option("compression", "zstd").parquet(next)
      // bounded deltas + offsets, collected BEFORE any mutation so the
      // release append never reads a directory it writes
      val k0 = s.read.parquet(sub).filter(col("keep") === 1).select(col("doc_id"))
      val k1 = s.read.parquet(next).filter(col("keep") === 1).select(col("doc_id"))
      val adds = k1.join(k0, Seq("doc_id"), "left_anti")
        .collect().map(_.getLong(0)).toSeq
      val demoted = k0.join(k1, Seq("doc_id"), "left_anti")
        .collect().map(_.getLong(0)).toSeq
      val live = s.read.parquet(releaseDir)
      val pub = live.filter(col("status") === "published")
      val packBases = pub.groupBy("source")
        .agg((max("pack_id") + 1).as("pack_base"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val shardBase = pub.agg(max("shard_id")).head.getLong(0) + 1
      val collisions = pub
        .join(adds.toDF("a"), col("doc_id") === col("a"), "left_semi")
        .limit(1).collect()
      require(collisions.isEmpty,
        "release ingest: a batch addition collides with a published doc " +
          "(a demoted keeper can never re-win — duplicate absorb?)")
      val revoked = pub
        .join(demoted.toDF("d"), col("doc_id") === col("d"), "left_semi")
        .select(col("source"), col("doc_id"), col("n_toks"),
          col("pack_id"), col("shard_id"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
        .toSeq
      val addRows = releaseRows(
        b.join(adds.toDF("doc_id"), Seq("doc_id"), "left_semi"),
        packBases, shardBase, packTokens, shardTokens)
      val tombRows = revoked
        .toDF("source", "doc_id", "n_toks", "pack_id", "shard_id")
        .select(col("source"), col("doc_id"), col("n_toks"),
          col("pack_id"), col("shard_id"), lit("revoked").as("status"))
      addRows.unionByName(tombRows)
        .write.mode(SaveMode.Append)
        .option("compression", "zstd").parquet(releaseDir)
      // now mutate the dedup state: band index grows, manifest swaps
      Dedup.appendToBandIndex(b, indexDir)
      val conf = s.sparkContext.hadoopConfiguration
      val subPath = new org.apache.hadoop.fs.Path(sub)
      val fs = subPath.getFileSystem(conf)
      fs.delete(subPath, true)
      if (!fs.rename(new org.apache.hadoop.fs.Path(next), subPath))
        throw new java.io.IOException(
          s"release ingest: could not swap $next into $sub")
    }
    ()
  }

  /** EPOCH-BOUNDARY compaction for the release store: fold the tombstones
    * into a rewritten base — the live view (published LEFT ANTI revoked)
    * becomes the new store verbatim, the masked rows and the accumulated
    * per-micro-batch small files disappear. This is the one moment the
    * immutable-publication contract licenses a rewrite: between epochs no
    * loader holds addresses, so the store may shed what every reader
    * already masks (the q129/[[graft.operators.IvfIndex.compactIndex]]
    * contract: value-invisible on the folded view, file count shrinks).
    * Write-aside then swap; output clustered by shard for the loader's
    * sequential reads.
    */
  def compactRelease(
      spark: org.apache.spark.sql.SparkSession,
      releaseDir: String,
      targetFileBytes: Long = 128L << 20): Unit = {
    val rel = spark.read.parquet(releaseDir)
    val live = rel.filter(col("status") === "published")
      .join(rel.filter(col("status") === "revoked").select(col("doc_id")),
        Seq("doc_id"), "left_anti")
      .select(col("source"), col("doc_id"), col("n_toks"),
        col("pack_id"), col("shard_id"), col("status"))
    // clamp BEFORE toInt (the IvfIndex.compactIndex lesson): an
    // unavailable-stats fallback must degrade to many partitions, not one
    val nOut = math.max(1,
      (live.queryExecution.optimizedPlan.stats.sizeInBytes / BigInt(targetFileBytes))
        .min(BigInt(1 << 20)).toInt)
    live.repartition(nOut, col("shard_id"))
      .sortWithinPartitions("shard_id", "pack_id", "doc_id")
      .write.mode(SaveMode.Overwrite)
      .option("compression", "zstd").parquet(releaseDir + ".next")
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(releaseDir)
    val fs = p.getFileSystem(conf)
    fs.delete(p, true)
    if (!fs.rename(new org.apache.hadoop.fs.Path(releaseDir + ".next"), p))
      throw new java.io.IOException(
        s"release compaction: could not swap into $releaseDir")
  }

  /** Pack + shard the given docs under the q120 offset rule and emit
    * release rows with status 'published'. `packBases` / `shardBase` are
    * the collected continuation offsets (empty / 0 on bootstrap).
    */
  private def releaseRows(
      docs: DataFrame,
      packBases: Seq[(String, Long)],
      shardBase: Long,
      packTokens: Int,
      shardTokens: Int): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val bases = packBases.toDF("source", "pack_base")
    val pd = ShardExport.packedDocs(docs, packTokens)
      .join(broadcast(bases), Seq("source"), "left")
      .select(col("source"),
        (col("pack_id") + coalesce(col("pack_base"), lit(0L))).as("pack_id"),
        col("doc_id"), col("n_toks"))
    val packs = pd.groupBy("source", "pack_id")
      .agg(sum("n_toks").as("pack_toks"))
    val asg = ShardExport.assignShards(packs, epoch = 1, shardTokens)
      .select(col("source"), col("pack_id"),
        (col("shard_id") + shardBase).as("shard_id"))
    pd.join(asg, Seq("source", "pack_id"))
      .select(col("source"), col("doc_id"),
        col("n_toks").cast("long").as("n_toks"),
        col("pack_id"), col("shard_id"), lit("published").as("status"))
  }
}
