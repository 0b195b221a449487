package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.ShardExport
import graft.queries.Tables

/** The export contract: deterministic (re-running produces byte-identical
  * shard assignment), complete (every doc lands in exactly one shard), and
  * budget-shaped (shards fill to the token budget, <1 pack overshoot).
  */
class ShardExportSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("re-running the export produces byte-identical shard assignment and manifest") {
    val docs = Tables(spark, sfDir, "documents")
    val d1 = Files.createTempDirectory("graft-shards-a").toString
    val d2 = Files.createTempDirectory("graft-shards-b").toString
    val e1 = ShardExport.write(docs, d1, epoch = 1, packTokens = 512, shardTokens = 2048)
    val e2 = ShardExport.write(docs, d2, epoch = 1, packTokens = 512, shardTokens = 2048)

    val m1 = ShardExport.manifest(spark, e1).collect().map(_.toSeq).toSeq
    val m2 = ShardExport.manifest(spark, e2).collect().map(_.toSeq).toSeq
    assert(m1 === m2)

    // row-level identity, not just aggregate identity: every (shard, doc)
    // assignment must re-deal identically
    def rows(dir: String) = spark.read.parquet(dir)
      .select("shard_id", "source", "pack_id", "doc_id")
      .collect().map(_.toSeq).toSet
    assert(rows(e1) === rows(e2))
  }

  test("every doc lands in exactly one shard; shards fill to budget with <1 pack overshoot") {
    val docs = Tables(spark, sfDir, "documents")
    val out = Files.createTempDirectory("graft-shards-c").toString
    val dir = ShardExport.write(docs, out, epoch = 1, packTokens = 512, shardTokens = 2048)
    val written = spark.read.parquet(dir)

    val nDocs = docs.count()
    assert(written.count() === nDocs)
    assert(written.select("doc_id").distinct().count() === nDocs)

    // every shard except the last must have started BELOW budget before its
    // final pack (exclusive-cumsum assignment): total tokens of any shard
    // minus its largest pack is < shardTokens
    val perShard = written
      .groupBy("shard_id", "source", "pack_id")
      .agg(sum(size(split(col("text"), " ", -1))).as("pt"))
      .groupBy("shard_id")
      .agg(sum("pt").as("toks"), max("pt").as("maxPack"))
      .collect()
    perShard.foreach { r =>
      assert(r.getAs[Long]("toks") - r.getAs[Long]("maxPack") < 2048,
        s"shard ${r.get(0)} overfilled beyond one-pack overshoot")
    }
  }

  test("different epochs produce different shuffles of the same packs") {
    val docs = Tables(spark, sfDir, "documents")
    val packs = ShardExport.packedDocs(docs, 512)
      .groupBy("source", "pack_id").agg(sum("n_toks").as("pack_toks"))
    val a1 = ShardExport.assignShards(packs, epoch = 1, shardTokens = 2048)
      .select("source", "pack_id", "shard_id").collect().map(_.toSeq).toSet
    val a2 = ShardExport.assignShards(packs, epoch = 2, shardTokens = 2048)
      .select("source", "pack_id", "shard_id").collect().map(_.toSeq).toSet
    assert(a1 !== a2)
  }

  test("multi-epoch coverage: distinct permutations, identical totals, every pack once per epoch") {
    val docs = Tables(spark, sfDir, "documents")
    val out = Files.createTempDirectory("graft-shards-e").toString
    val e0 = ShardExport.write(docs, out, epoch = 0, packTokens = 512, shardTokens = 2048)
    val e1 = ShardExport.write(docs, out, epoch = 1, packTokens = 512, shardTokens = 2048)

    def packAssign(dir: String) = spark.read.parquet(dir)
      .select("source", "pack_id", "shard_id").distinct()
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getAs[Number](2).longValue()).toMap
    val p0 = packAssign(e0)
    val p1 = packAssign(e1)

    // every pack appears EXACTLY once per epoch (same pack universe, and
    // distinct() above + equal sizes rule out a pack in two shards)
    assert(p0.keySet === p1.keySet, "epochs must cover the identical pack universe")
    val nPairs0 = spark.read.parquet(e0).select("source", "pack_id", "shard_id").distinct().count()
    assert(nPairs0 === p0.size.toLong, "a pack landed in more than one shard in epoch 0")

    // the epoch reshuffle is a real permutation, not the identity
    assert(p0 !== p1, "epoch 0 and 1 must order packs differently")

    // manifest TOTALS (docs, seqs, tokens, content) are epoch-invariant
    // even though the per-shard split differs — shuffling moves packs
    // around, it never duplicates or drops content
    def totals(dir: String) = ShardExport.manifest(spark, dir)
      .agg(sum("n_seqs"), sum("n_docs"), sum("n_tokens"), sum("content_hash"))
      .collect()(0).toSeq
    assert(totals(e0) === totals(e1), "epoch totals must be identical")
  }

  test("incremental append: published shards byte-stable, batch in new shards only, totals conserved") {
    val docs = Tables(spark, sfDir, "documents")
    val base = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val batch = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
    val out = Files.createTempDirectory("graft-shards-incr").toString
    val dir = ShardExport.write(base, out, epoch = 1, packTokens = 512, shardTokens = 2048)

    // snapshot every base shard file (path -> (size, mtime-insensitive content hash))
    def files(d: String): Map[String, String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles.toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(d)).filter(_.getName.endsWith(".parquet")).map { f =>
        val bytes = java.nio.file.Files.readAllBytes(f.toPath)
        f.getAbsolutePath -> java.util.Base64.getEncoder.encodeToString(
          java.security.MessageDigest.getInstance("MD5").digest(bytes))
      }.toMap
    }
    val before = files(dir)
    val baseMax = spark.read.parquet(dir)
      .agg(max(col("shard_id").cast("long"))).head.getLong(0)
    val baseManifest = ShardExport.manifest(spark, dir).collect()
      .map(r => r.getLong(0) -> r.toSeq).toMap

    ShardExport.append(spark, batch, dir, epoch = 1, packTokens = 512, shardTokens = 2048)

    // 1. every pre-existing file is untouched (same path, same bytes)
    val after = files(dir)
    before.foreach { case (p, h) =>
      assert(after.get(p).contains(h), s"published shard file changed: $p")
    }
    // 2. batch docs land ONLY in shards past the base max
    val all = spark.read.parquet(dir)
      .select(col("shard_id").cast("long").as("sid"), col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    all.foreach { case (sid, doc) =>
      if (doc % 5 == 0) assert(sid > baseMax, s"batch doc $doc in published shard $sid")
      else assert(sid <= baseMax, s"base doc $doc migrated to appended shard $sid")
    }
    // 3. base manifest rows are unchanged and the union conserves docs/tokens
    val unified = ShardExport.manifest(spark, dir).collect()
      .map(r => r.getLong(0) -> r.toSeq).toMap
    baseManifest.foreach { case (sid, rowB) =>
      assert(unified(sid) == rowB, s"manifest row for published shard $sid changed")
    }
    val totDocs = unified.values.map(_(2).asInstanceOf[Long]).sum
    assert(totDocs == docs.count(), "append must conserve the doc universe")
    // 4. re-running the same day-0+append sequence is byte-deterministic
    val out2 = Files.createTempDirectory("graft-shards-incr2").toString
    val dir2 = ShardExport.write(base, out2, epoch = 1, packTokens = 512, shardTokens = 2048)
    ShardExport.append(spark, batch, dir2, epoch = 1, packTokens = 512, shardTokens = 2048)
    val m1 = ShardExport.manifest(spark, dir).collect().map(_.toSeq).toSeq
    val m2 = ShardExport.manifest(spark, dir2).collect().map(_.toSeq).toSeq
    assert(m1 == m2, "incremental export must re-deal identically")
    // 5. reset + re-append (the day-boundary replay primitive) restores
    // the identical state: published files still byte-identical, manifest
    // unchanged
    ShardExport.resetAppended(dir, baseMax)
    assert(files(dir).keySet == before.keySet, "reset must restore exactly the day-0 files")
    ShardExport.append(spark, batch, dir, epoch = 1, packTokens = 512, shardTokens = 2048)
    val m3 = ShardExport.manifest(spark, dir).collect().map(_.toSeq).toSeq
    assert(m3 == m1, "reset + re-append must reproduce the manifest")
    // 6. the O(batch) daily manifest (stored base rows ∪ new-shard rows)
    // equals the full re-read — shard-dir disjointness makes it exact
    val baseRows = ShardExport.manifest(spark, dir)
      .filter(col("shard_id") <= baseMax)
    val mInc = ShardExport
      .manifestIncremental(spark, dir, baseRows, baseMax)
      .collect().map(_.toSeq).toSeq
    assert(mInc == m3, "incremental manifest must equal the full re-read")
  }

  test("multi-day appends: stability chains, shard ids strictly grow, universe conserved") {
    val docs = Tables(spark, sfDir, "documents")
    val day = (d: Int) => docs.filter(pmod(col("doc_id"), lit(3)) === d)
    val out = Files.createTempDirectory("graft-shards-multiday").toString
    val dir = ShardExport.write(day(0), out, epoch = 1, packTokens = 512, shardTokens = 2048)

    def fileSet(d: String): Set[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles.toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(d)).filter(_.getName.endsWith(".parquet"))
        .map(f => s"${f.getAbsolutePath}:${f.length}").toSet
    }
    def maxShard() = spark.read.parquet(dir)
      .agg(max(col("shard_id").cast("long"))).head.getLong(0)

    var published = fileSet(dir)
    var prevMax = maxShard()
    (1 to 2).foreach { d =>
      ShardExport.append(spark, day(d), dir, epoch = 1, packTokens = 512, shardTokens = 2048)
      val now = fileSet(dir)
      assert(published.subsetOf(now), s"day $d rewrote published files")
      val newMax = maxShard()
      assert(newMax > prevMax, s"day $d: shard ids must strictly grow")
      published = now
      prevMax = newMax
    }
    // after three days every doc is present exactly once
    val ids = spark.read.parquet(dir).select("doc_id").collect().map(_.getLong(0))
    assert(ids.length == ids.distinct.length, "a doc landed twice across days")
    assert(ids.length == docs.count(), "the three-day union must cover the corpus")
    // and the O(batch) manifest still equals the full re-read with the
    // published cut at ANY earlier day boundary
    val full = ShardExport.manifest(spark, dir).collect().map(_.toSeq).toSeq
    val inc = ShardExport.manifestIncremental(spark, dir,
      ShardExport.manifest(spark, dir).filter(col("shard_id") <= prevMax - 1), prevMax - 1)
      .collect().map(_.toSeq).toSeq
    assert(inc == full, "incremental manifest must equal full at an interior boundary")
  }

  test("integrity audit: clean store all-ok; missing/orphan/corrupt each detected") {
    val docs = Tables(spark, sfDir, "documents")
    val out = Files.createTempDirectory("graft-shards-audit").toString
    val dir = ShardExport.write(docs, out, epoch = 1, packTokens = 512, shardTokens = 2048)
    // materialize the manifest into a detached DataFrame — the stored
    // manifest is a persisted artifact in production, not a live view of
    // the files it attests (a lazy plan would re-read the vandalized store)
    val live = ShardExport.manifest(spark, dir)
    val storedRows = live.collect()
    val stored = spark.createDataFrame(
      spark.sparkContext.parallelize(storedRows.toIndexedSeq), live.schema)
    assert(storedRows.length >= 3, "need >=3 shards to plant three damage classes")

    // clean store: every shard ok, metrics equal the stored attestation
    val clean = ShardExport.audit(spark, dir, stored).collect()
    assert(clean.forall(_.getAs[String]("status") == "ok"))
    assert(clean.map(r => (r.getLong(0), r.toSeq.drop(2))).toMap ===
      storedRows.map(r => (r.getLong(0), r.toSeq.drop(1))).toMap)

    // plant damage on three distinct shards:
    val sids = storedRows.map(_.getLong(0)).sorted
    val (missingSid, corruptSid) = (sids.head, sids(1))
    val orphanSid = sids.max + 100
    // missing: delete the shard directory the manifest promises
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm); f.delete(); ()
    }
    rm(new java.io.File(s"$dir/shard_id=$missingSid"))
    // orphan: a shard directory the manifest never recorded
    spark.read.parquet(s"$dir/shard_id=$corruptSid")
      .write.parquet(s"$dir/shard_id=$orphanSid")
    // corrupt: doctor the stored token count for one surviving shard
    val doctored = stored.withColumn("n_tokens",
      when(col("shard_id") === corruptSid, col("n_tokens") + 1)
        .otherwise(col("n_tokens")))

    val audit = ShardExport.audit(spark, dir, doctored).collect()
      .map(r => r.getLong(0) -> r.getAs[String]("status")).toMap
    assert(audit(missingSid) == "missing")
    assert(audit(orphanSid) == "orphan")
    assert(audit(corruptSid) == "corrupt")
    val planted = Set(missingSid, orphanSid, corruptSid)
    audit.filterNot { case (sid, _) => planted(sid) }.foreach { case (sid, st) =>
      assert(st == "ok", s"undamaged shard $sid must stay ok")
    }
    // missing rows report the stored promise (there are no disk bytes to attest)
    val missingRow = ShardExport.audit(spark, dir, doctored)
      .filter(col("shard_id") === missingSid).collect()(0)
    val promised = storedRows.find(_.getLong(0) == missingSid).get
    assert(missingRow.toSeq.drop(2) === promised.toSeq.drop(1))
  }
}
