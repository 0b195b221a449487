package graft

import org.apache.spark.sql.functions._

/** Invariant-level coverage for the curation/analytics queries (the driver's
  * DuckDB oracle pins exact values; these assertions pin SEMANTICS that must
  * survive a testdata regeneration).
  */
class CurationSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q157 pack manifest: spans tile each pack; only a pack's last doc may overshoot") {
    import spark.implicits._
    // planted: 4-token docs against a 10-token pack — offsets 0,4,8,12
    // so doc 3 overshoots pack 0 (span 8..12) and doc 4 starts pack 1
    // at local offset 2 (concat-then-chunk coordinates, not a reset)
    val planted = Seq.tabulate(4)(i =>
      (i.toLong + 1, "s0", (1 to 4).map(j => s"w$j").mkString(" ")))
      .toDF("doc_id", "source", "text")
    val got = graft.queries.Release.packManifest(planted, packTokens = 10)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5)))
    assert(got.toSeq == Seq(
      (0L, 1L, 0L, 4L, 0), (0L, 2L, 4L, 8L, 0), (0L, 3L, 8L, 12L, 1),
      (1L, 4L, 2L, 6L, 0)), s"got ${got.toSeq}")

    // corpus invariants: the manifest is q58's cumsum at row grain —
    // per (source, pack) it must reproduce q58's doc counts and token
    // sums exactly, and only the last doc of a pack may overshoot
    val m = graft.queries.Release
      .packManifest(graft.queries.Tables(spark, dir, "documents"))
    val fromManifest = m.groupBy("source", "pack_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tok_end") - col("tok_start")).as("sum_tokens"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val fromQ58 = SparkEntry.queries("q58_seq_packing")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(fromManifest == fromQ58,
      "manifest rollup must equal q58's pack audit cell for cell")
    val lastPerPack = m.groupBy("source", "pack_id").agg(max("doc_id").as("last_id"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    m.filter(col("crosses_boundary") === 1).collect().foreach { r =>
      assert(lastPerPack((r.getString(0), r.getLong(1))) == r.getLong(2),
        s"non-final doc overshoots its pack: $r")
    }
  }

  test("q159 pack append: batch resumes the store's token stream exactly") {
    import spark.implicits._
    // planted: store = docs 1,2 (4 tokens each, 10-token packs → total 8);
    // batch = docs 11,12. Doc 11 must FILL pack 0's last partial window
    // (span 8..12, crossing), doc 12 continues in pack 1 at local 2 —
    // and because store ids < batch ids, the two-step fold must equal the
    // one-shot manifest over the union verbatim.
    def mk(ids: Seq[Long]) = ids.map(i =>
      (i, "s0", (1 to 4).map(j => s"w$j").mkString(" ")))
      .toDF("doc_id", "source", "text")
    val store = graft.queries.Release.packManifest(mk(Seq(1L, 2L)), packTokens = 10)
    val got = graft.queries.Release
      .packManifestAppend(store, mk(Seq(11L, 12L)), packTokens = 10)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5)))
    assert(got.toSeq == Seq(
      (0L, 1L, 0L, 4L, 0), (0L, 2L, 4L, 8L, 0), (0L, 11L, 8L, 12L, 1),
      (1L, 12L, 2L, 6L, 0)), s"got ${got.toSeq}")
    val oneShot = graft.queries.Release
      .packManifest(mk(Seq(1L, 2L)).unionByName(mk(Seq(11L, 12L))), packTokens = 10)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5)))
    assert(got.toSeq == oneShot.toSeq, "append must equal the one-shot fold")

    // empty store: append degenerates to packManifest of the batch
    val fromEmpty = graft.queries.Release
      .packManifestAppend(store.filter(lit(false)), mk(Seq(11L, 12L)), packTokens = 10)
      .collect().map(_.toSeq)
    val direct = graft.queries.Release.packManifest(mk(Seq(11L, 12L)), packTokens = 10)
      .collect().map(_.toSeq)
    assert(fromEmpty.toSeq == direct.toSeq)

    // corpus invariants (the oracle pins values; these pin the contract):
    // store rows pass through byte-identical, and each source's first
    // batch span starts at the store's token total for that source —
    // %7 batch convention so every src(doc_id%20) source has both days
    val docs = graft.queries.Tables(spark, dir, "documents")
    val cStore = graft.queries.Release
      .packManifest(docs.filter(col("doc_id") % 7 =!= 0))
    val res = graft.queries.Release
      .packManifestAppend(cStore, docs.filter(col("doc_id") % 7 === 0))
    val storeSet = cStore.collect().map(_.toSeq).toSet
    val through = res.filter(col("doc_id") % 7 =!= 0).collect().map(_.toSeq).toSet
    assert(through == storeSet, "store spans must pass through untouched")
    val totals = cStore.groupBy("source")
      .agg(max(col("pack_id") * 512 + col("tok_end")).as("tot"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val firsts = res.filter(col("doc_id") % 7 === 0)
      .withColumn("off", col("pack_id") * 512 + col("tok_start"))
      .groupBy("source").agg(min(struct(col("doc_id"), col("off"))).as("f"))
      .collect().map(r => r.getString(0) -> r.getStruct(1).getLong(1))
    firsts.foreach { case (source, off) =>
      assert(off == totals(source),
        s"$source: first batch span must resume at the store total")
    }
    // the continuation genuinely fires: some source resumes MID-window
    assert(firsts.exists { case (_, off) => off % 512 != 0 },
      "fixture must exercise a mid-window resume")
  }

  test("q163 boundary pack: no window exceeds the budget; slots fill sequentially") {
    import spark.implicits._
    // planted: lens 10,16,17,500,600 against the 16/32/.../512 cascade
    val planted = Seq(
      (1L, "s0", (1 to 10).map(_ => "w").mkString(" ")),
      (2L, "s0", (1 to 16).map(_ => "w").mkString(" ")),
      (3L, "s0", (1 to 17).map(_ => "w").mkString(" ")),
      (4L, "s0", (1 to 500).map(_ => "w").mkString(" ")),
      (5L, "s0", (1 to 600).map(_ => "w").mkString(" ")))
      .toDF("doc_id", "source", "text")
    val got = graft.queries.Release.boundaryPack(planted)
      .collect().map(r => (r.getLong(2), r.getInt(1), r.getLong(4), r.getLong(5),
        r.getLong(6), r.getInt(7))).toSeq
    assert(got == Seq(
      (1L, 16, 0L, 0L, 6L, 0),   // slot 16, first of 32/window
      (2L, 16, 0L, 1L, 0L, 0),   // same window, next slot, zero pad
      (3L, 32, 0L, 0L, 15L, 0),  // next power of two
      (4L, 512, 0L, 0L, 12L, 0), // own window
      (5L, 512, 1L, 0L, 0L, 1)), // oversize: own window (cap 1), no pad, flagged
      s"got $got")

    // corpus invariants: every (source, slot, window) holds at most
    // 512/slot docs whose slots sum within the budget — the no-crossing
    // contract — and slot positions are exactly 0..n-1
    val m = graft.queries.Release
      .boundaryPack(graft.queries.Tables(spark, dir, "documents"))
    val viol = m.groupBy("source", "bucket_slot", "window_id")
      .agg(count(lit(1)).as("n"), max("slot_pos").as("mx"))
      .filter(col("n") * col("bucket_slot") > 512 || col("mx") =!= col("n") - 1)
    assert(viol.isEmpty, "window over budget or non-sequential slots")
    assert(m.filter(col("oversize") === 1).isEmpty,
      "fixture has no oversize docs; the flag must not fire")
  }

  test("q165 boundary-pack append: buckets resume their numbering; store passes through") {
    import spark.implicits._
    val docs = graft.queries.Tables(spark, dir, "documents")
    val store = graft.queries.Release
      .boundaryPack(docs.filter(col("doc_id") % 7 =!= 0))
    val res = graft.queries.Release
      .boundaryPackAppend(store, docs.filter(col("doc_id") % 7 === 0))
    assert(res.filter(col("doc_id") % 7 =!= 0).collect().map(_.toSeq).toSet ==
      store.collect().map(_.toSeq).toSet,
      "store rows must pass through untouched")
    // per (source, slot): the first batch doc takes exactly the next rn
    val counts = store.groupBy("source", "bucket_slot")
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val firsts = res.filter(col("doc_id") % 7 === 0)
      .withColumn("rn",
        col("window_id") * floor(lit(512.0) / col("bucket_slot")).cast("long")
          + col("slot_pos"))
      .groupBy("source", "bucket_slot")
      .agg(min(struct(col("doc_id"), col("rn"))).as("f"))
      .collect().map(r => ((r.getString(0), r.getInt(1)), r.getStruct(2).getLong(1)))
    firsts.foreach { case (k, rn) =>
      assert(rn == counts.getOrElse(k, 0L),
        s"$k: first batch doc must take the next free slot")
    }
    // the mid-window continuation genuinely fires somewhere
    val caps = Map(16 -> 32L, 32 -> 16L, 64 -> 8L, 128 -> 4L, 256 -> 2L, 512 -> 1L)
    assert(firsts.exists { case ((_, s), rn) => rn % caps(s) != 0 },
      "fixture must exercise a mid-window slot resume")
  }

  test("q167 boundary-pack retract: tail retract restores; non-tail raises") {
    import spark.implicits._
    def mk(ids: Seq[Long]) = ids.map(i =>
      (i, "s0", (1 to 4).map(_ => "w").mkString(" ")))
      .toDF("doc_id", "source", "text")
    val path = java.nio.file.Files
      .createTempDirectory("graft-bpr-spec").toString + "/store"
    graft.queries.Release.boundaryPack(mk(Seq(1L, 2L))).write.parquet(path)
    graft.queries.Release.absorbIntoBoundaryPackStore(spark, mk(Seq(11L, 12L)), path)
    val before = spark.read.parquet(path).collect().map(_.toSeq).toSet
    // non-tail: docs 1,2 are buried under 11,12 in the slot-16 bucket
    val ex = intercept[Exception] {
      graft.queries.Release.retractFromBoundaryPackStore(
        spark, Seq(1L).toDF("doc_id"), path)
    }
    def msg(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" ")
    assert(msg(ex).contains("not the bucket tail"), msg(ex).take(200))
    assert(spark.read.parquet(path).collect().map(_.toSeq).toSet == before,
      "failed non-tail retract must leave the store untouched")
    // tail retract restores the pre-absorb manifest exactly
    graft.queries.Release.retractFromBoundaryPackStore(
      spark, Seq(11L, 12L).toDF("doc_id"), path)
    assert(spark.read.parquet(path).collect().map(_.toSeq).toSet ==
      graft.queries.Release.boundaryPack(mk(Seq(1L, 2L)))
        .collect().map(_.toSeq).toSet,
      "tail retract must restore the never-absorbed manifest")
  }

  test("q169 incremental release: additions are batch docs, statuses agree with the keeper sets") {
    val rel = SparkEntry.queries("q169_incremental_release")(spark, dir)
      .collect().map(r => (r.getLong(1), r.getString(5)))
    assert(Set("published", "revoked", "added").subsetOf(rel.map(_._2).toSet),
      "fixture must exercise all three statuses")
    // additions ⊆ batch: a cluster merge can only promote one of the
    // previous keepers, so only batch docs can be new keepers
    rel.filter(_._2 == "added").foreach { case (id, _) =>
      assert(id % 5 == 0, s"added doc $id is not a batch doc")
    }
    // published ∪ revoked = yesterday's keeper set, verbatim addresses
    val k1 = SparkEntry.queries("q97_dedup_manifest")(spark, dir)
      .filter(col("keep") === 1).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    rel.foreach { case (id, st) =>
      if (st == "added" || st == "published")
        assert(k1.contains(id), s"$st doc $id must be a today-keeper")
      else assert(!k1.contains(id), s"revoked doc $id still keeps")
    }
  }

  test("q171 release retract: restores the never-absorbed day-1 release; wrong-batch retract raises") {
    val docs = graft.queries.Tables(spark, dir, "documents")
    val restored = SparkEntry.queries("q171_release_retract")(spark, dir).collect()
    assert(restored.forall(_.getString(5) == "published"),
      "a retracted release must carry no 'added'/'revoked' rows")
    // absorb∘retract ≡ rebuild-without-batch: the restored rows must be
    // the q164 chain over the %5≠0 store corpus, address for address
    val store = docs.filter(col("doc_id") % 5 =!= 0)
    val keep = graft.queries.Dedup.dedupManifest(store)
      .filter(col("keep") === 1).select(col("doc_id"))
    val pd = graft.ops.ShardExport
      .packedDocs(store.join(keep, Seq("doc_id"), "left_semi"), 512)
    val asg = graft.ops.ShardExport
      .assignShards(
        pd.groupBy("source", "pack_id").agg(sum("n_toks").as("pack_toks")),
        epoch = 1, shardTokens = 2048)
      .select(col("source"), col("pack_id"), col("shard_id"))
    val expected = pd.join(asg, Seq("source", "pack_id"))
      .select(col("source"), col("doc_id"), col("n_toks").cast("long"),
        col("pack_id"), col("shard_id"))
      .collect().map(_.toSeq).toSet
    assert(restored.map(r => r.toSeq.dropRight(1)).toSet == expected,
      "retract must restore the never-absorbed day-1 release exactly")
    // guard: retracting a DIFFERENT batch (one added doc missing from the
    // id list) must raise, not silently drop somebody else's tail
    val manifest = graft.queries.Release.incrementalRelease(spark, dir)
    val anAdd = manifest.filter(col("status") === "added")
      .select(col("doc_id")).head.getLong(0)
    val wrongBatch = docs.filter(col("doc_id") % 5 === 0)
      .filter(col("doc_id") =!= anAdd).select(col("doc_id"))
    val ex = intercept[Exception] {
      graft.queries.Release.retractRelease(manifest, wrongBatch).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("release retract")),
      s"wrong-batch retract must trip the guard, got: $ex")
  }

  test("q172 takedown locator: arms agree with their stand-alone manifests; non-keepers carry no release row") {
    val loc = SparkEntry.queries("q172_takedown_locator")(spark, dir).collect()
      .map(r => (r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
    val ids = loc.map(_._1).toSet
    assert(ids.nonEmpty && ids.forall(_ % 97 == 0))
    val byArtifact = loc.groupBy(_._2)
    // every takedown doc is located in BOTH loader manifests
    assert(byArtifact("pack_span").map(_._1).toSet == ids,
      "every takedown doc must have a pack span")
    assert(byArtifact("boundary_slot").map(_._1).toSet == ids,
      "every takedown doc must have a boundary-pack cell")
    // pack spans are q157's rows verbatim
    val q157 = SparkEntry.queries("q157_pack_manifest")(spark, dir)
      .collect().map(r => r.getLong(2) -> (r.getLong(1), r.getLong(3))).toMap
    assert(byArtifact("pack_span").map(t => t._1 -> (t._3, t._4)).toMap ==
      q157.filter { case (id, _) => ids.contains(id) },
      "pack-span addresses must match q157")
    // release rows exactly = takedown ∩ keepers, at their q164 address
    val q164 = SparkEntry.queries("q164_release_manifest")(spark, dir)
      .collect().map(r => r.getLong(1) -> (r.getLong(3), r.getLong(4))).toMap
    assert(byArtifact.getOrElse("release", Array.empty[(Long, String, Long, Long)])
      .map(t => t._1 -> (t._3, t._4)).toMap ==
      q164.filter { case (id, _) => ids.contains(id) },
      "release arm must be q164's rows verbatim — keepers only")
  }

  test("q175 review sample: 5 dense-ranked keepers per source, signals bounded") {
    val rows = SparkEntry.queries("q175_review_sample")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val bySource = rows.groupBy(_._1)
    assert(bySource.size == 20)
    bySource.values.foreach { g =>
      assert(g.map(_._2).sorted.toSeq == (1L to 5L),
        "ranks must be dense 1..5 per source")
    }
    val keepers = SparkEntry.queries("q97_dedup_manifest")(spark, dir)
      .filter(col("keep") === 1).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    rows.foreach { case (_, _, id, nToks, nChars, uniqPm) =>
      assert(keepers.contains(id), s"sampled doc $id is not a keeper")
      assert(nToks > 0 && nChars > 0 && uniqPm >= 0 && uniqPm <= 1000)
    }
  }

  test("q166 integrity audit: planted damage is detected; the clean fixture audits zero") {
    import spark.implicits._
    // planted: doc 1 duplicated ACROSS sources (both charged), doc 3's
    // n_chars doctored, doc 4 whitespace-only, doc 5 null text
    val planted = Seq(
      (1L, "sA", "alpha beta", 10L),
      (1L, "sB", "alpha beta", 10L),
      (3L, "sA", "gamma", 99L),
      (4L, "sB", "   ", 3L),
      (5L, "sB", null, 0L))
      .toDF("doc_id", "source", "text", "n_chars")
    val got = graft.queries.Release.integrityAudit(planted)
      .select("source", "n_dup_id", "n_chars_bad", "n_empty")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == Seq(("sA", 1L, 1L, 0L), ("sB", 1L, 0L, 2L)), s"got $got")

    // clean fixture: every violation column is zero, profile is sane
    val corpus = SparkEntry.queries("q166_integrity_audit")(spark, dir).collect()
    assert(corpus.length == 20)
    corpus.foreach { r =>
      assert(r.getLong(5) == 0 && r.getLong(6) == 0 && r.getLong(7) == 0,
        s"clean fixture must audit zero violations: $r")
      assert(r.getLong(1) > 0 && r.getLong(2) > 0)
    }
  }

  test("q164 release manifest: stages agree with their stand-alone siblings") {
    val rel = SparkEntry.queries("q164_release_manifest")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    // the kept set IS q97's keep=1 set — the dedup stage cannot disagree
    val keepers = SparkEntry.queries("q97_dedup_manifest")(spark, dir)
      .filter(col("keep") === 1).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(rel.map(_._2).toSet == keepers,
      "release manifest must carry exactly q97's keepers")
    // every (source, pack) maps to one shard (the assignment is a pure
    // function of the pack key), and no doc appears twice
    assert(rel.map(_._2).distinct.length == rel.length)
    val packShards = rel.map(t => (t._1, t._3) -> t._4).distinct
    assert(packShards.map(_._1).distinct.length == packShards.length,
      "a pack must land in exactly one shard")
  }

  test("q57 mixture sampling: kept counts respect the per-stratum rate, deterministically") {
    val rows = SparkEntry.queries("q57_source_mixing")(spark, dir).collect()
    rows.foreach { r =>
      val (total, kept) = (r.getLong(1), r.getLong(2))
      assert(kept <= total, s"${r.getString(0)}: kept $kept > total $total")
    }
    // deterministic: a second run deals the identical sample
    val again = SparkEntry.queries("q57_source_mixing")(spark, dir).collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
    // the three stratum rates genuinely differ across sources
    val ratios = rows.map(r => math.round(100.0 * r.getLong(2) / r.getLong(1)))
    assert(ratios.distinct.length > 1, s"rates must vary by stratum: ${ratios.mkString(",")}")
  }

  test("q115 adaptive quality: per-source thresholds keep the smallest >=70% set") {
    val rows = SparkEntry.queries("q115_adaptive_quality")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (source, docs) =>
      val n = docs.length
      val target = math.ceil(0.7 * n).toLong
      val thr = docs.head._4
      assert(docs.forall(_._4 == thr), s"$source: threshold must be one per source")
      val kept = docs.count(_._5 == 1)
      // keep-set reaches the target...
      assert(kept >= target, s"$source: kept $kept < target $target of $n")
      // ...and is minimal up to boundary ties: excluding the boundary
      // score drops below target
      val above = docs.count(d => d._3 > thr)
      assert(above < target, s"$source: threshold not tight (above=$above target=$target)")
      // keep flag is exactly the threshold comparison
      docs.foreach { case (id, _, score, t, keep) =>
        assert((keep == 1) == (score >= t), s"doc $id: keep flag != score>=thr")
      }
    }
  }

  test("q115 adaptive thresholds beat a global cutoff on a planted skewed corpus") {
    import spark.implicits._
    // source A scores high (dense text), source B low (space-padded): a
    // global 70% cutoff would keep ~all of A and ~none of B; the adaptive
    // filter must keep >=70% of EACH
    val docs = ((0 until 40).map(i => (i.toLong, s"a${i}" * (i % 7 + 1), "A")) ++
      (0 until 40).map(i => (1000L + i, ("b " * (i % 9 + 2)).trim + "  x", "B")))
      .toDF("doc_id", "text", "source")
    val out = graft.queries.Curation.adaptiveQualityFilter(docs, keepFraction = 0.7)
      .collect().map(r => (r.getString(1), r.getLong(3), r.getInt(4)))
    val bySource = out.groupBy(_._1)
    assert(bySource.keySet == Set("A", "B"))
    bySource.foreach { case (s, ds) =>
      val frac = ds.count(_._3 == 1).toDouble / ds.length
      assert(frac >= 0.7, s"source $s keeps only $frac")
    }
    // adaptivity: the two sources solved genuinely different thresholds
    assert(bySource("A").head._2 != bySource("B").head._2,
      "planted skew must produce distinct per-source thresholds")
  }

  test("q118 curriculum stages: monotone in score, near-quartile masses, tie-consistent") {
    val rows = SparkEntry.queries("q118_curriculum_stages")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows.nonEmpty)
    val n = rows.length
    // stage is monotone in score and equal scores share a stage
    rows.groupBy(_._2).foreach { case (score, ds) =>
      assert(ds.map(_._3).distinct.length == 1, s"score $score split across stages")
    }
    val byStage = rows.groupBy(_._3)
    assert(byStage.keySet.subsetOf(Set(1, 2, 3, 4)))
    val maxScorePerStage = byStage.view.mapValues(_.map(_._2).max).toMap
    assert(maxScorePerStage.toSeq.sortBy(_._1).map(_._2) ==
      maxScorePerStage.toSeq.sortBy(_._1).map(_._2).sorted,
      "stages must be score-ordered")
    // each stage holds ~a quarter up to boundary-tie slack: the cumulative
    // count through stage k reaches ceil(k*n/4)
    (1 to 3).foreach { k =>
      val through = rows.count(_._3 <= k)
      assert(through >= math.ceil(k * n / 4.0).toInt,
        s"cumulative through stage $k is $through < ${math.ceil(k * n / 4.0).toInt}")
    }
  }

  test("q119 epoch allocation: caps, budget accounting, and both regimes") {
    val rows = SparkEntry.queries("q119_epoch_allocation")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val nSources = rows.length
    val target = 60000L / nSources
    rows.foreach { case (src, _, toks, alloc, bp, shortfall) =>
      assert(alloc == math.min(4 * toks, target), s"$src: alloc wrong")
      assert(bp <= 40000L, s"$src: epoch cap exceeded ($bp bp)")
      assert(shortfall == target - alloc, s"$src: shortfall wrong")
      assert(shortfall >= 0, s"$src: negative shortfall")
      assert(bp == math.floor(10000.0 * alloc / toks).toLong, s"$src: bp wrong")
    }
    // the sized budget must exercise the repetition regime (some source
    // repeats: bp > 10000) — otherwise this is just q108 again
    assert(rows.exists(_._5 > 10000L), "no source entered the multi-epoch regime")
  }

  test("q121 incremental thresholds equal the from-scratch q115 solve (mergeable statistic)") {
    val incremental = SparkEntry.queries("q121_incremental_thresholds")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // from-scratch: q115's thresholds over the SAME full corpus
    val scratch = SparkEntry.queries("q115_adaptive_quality")(spark, dir).collect()
      .map(r => (r.getString(1), r.getLong(3)))
    val scratchThr = scratch.groupBy(_._1).view.mapValues(_.head._2).toMap
    val scratchN = scratch.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    assert(incremental.keySet == scratchThr.keySet)
    incremental.foreach { case (src, (n, thr)) =>
      assert(thr == scratchThr(src), s"$src: incremental thr $thr != scratch ${scratchThr(src)}")
      assert(n == scratchN(src), s"$src: merged count $n != scratch ${scratchN(src)}")
    }
    // merge is boundary-independent: ANY split of the corpus re-solves to
    // the same thresholds (the sufficient-statistic property itself)
    val docs = queries.Tables(spark, dir, "documents")
    val alt = queries.Curation.incrementalThresholds(
      queries.Curation.scoreHistogram(docs.filter(pmod(col("doc_id"), lit(3)) =!= 0)),
      docs.filter(pmod(col("doc_id"), lit(3)) === 0), keepFraction = 0.7)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(alt == incremental, "a different batch boundary must re-solve identically")
  }

  test("q123 drift monitor: planted distributions hit every status, L1 is exact") {
    import spark.implicits._
    def docs(ids: Range, src: String, words: Int, wlen: Int) =
      ids.map(i => (i.toLong, src, Seq.fill(words)("x" * wlen).mkString(" ")))
    val base = (docs(0 until 30, "A", 10, 6) ++ docs(100 until 130, "B", 10, 6) ++
      docs(200 until 205, "D", 10, 6)).toDF("doc_id", "source", "text")
    val batch = (docs(1000 until 1010, "A", 10, 6) ++ docs(1100 until 1110, "B", 2, 1) ++
      docs(1200 until 1204, "C", 3, 2)).toDF("doc_id", "source", "text")
    val out = queries.Curation.driftMonitor(
      queries.Curation.scoreHistogram(base), batch)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(out.keySet == Set("A", "B", "C", "D"))
    // A: identical distribution -> exact zero distance, ok
    assert(out("A") == ((30L, 10L, 0L, "ok")), s"A: ${out("A")}")
    // B: disjoint score buckets -> maximal L1 (= 2*n0*n1 scaled), drift
    assert(out("B")._4 == "drift" && out("B")._3 == 2 * 30L * 10L, s"B: ${out("B")}")
    // C only in the batch, D only in the store
    assert(out("C")._4 == "new" && out("C")._1 == 0L, s"C: ${out("C")}")
    assert(out("D")._4 == "stale" && out("D")._2 == 0L, s"D: ${out("D")}")
    // the scaled L1 is bounded by its maximum everywhere
    out.values.foreach { case (n0, n1, l1, _) =>
      assert(l1 <= 2 * n0 * n1 || n0 == 0 || n1 == 0)
    }
    // registered query runs against the live store/batch convention
    val live = SparkEntry.queries("q123_drift_monitor")(spark, dir).collect()
    assert(live.nonEmpty && live.forall(r =>
      Set("ok", "drift", "new", "stale").contains(r.getString(4))))
  }

  test("q124 content novelty: planted overlap fractions come out exact") {
    import spark.implicits._
    val base = Seq((0L, "S", "a b c d e f")).toDF("doc_id", "source", "text")
    val batch = Seq(
      (10L, "A", "a b c d e f"), // both windows seen -> 0 bp
      (11L, "B", "p q r s t u"), // both novel -> 10000 bp
      (12L, "C", "a b c d e x")  // one of two novel -> 5000 bp
    ).toDF("doc_id", "source", "text")
    val out = queries.Curation.contentNovelty(
      queries.Curation.windowStore(base), batch)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("A") == ((2L, 0L, 0L)), s"A: ${out("A")}")
    assert(out("B") == ((2L, 2L, 10000L)), s"B: ${out("B")}")
    assert(out("C") == ((2L, 1L, 5000L)), s"C: ${out("C")}")
    // registered form: sane bounds on the live store/batch convention
    val live = SparkEntry.queries("q124_content_novelty")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(live.nonEmpty)
    live.foreach { case (src, w, nv, bp) =>
      assert(nv <= w && bp >= 0 && bp <= 10000, s"$src: ($w, $nv, $bp)")
    }
  }

  test("q125 quality ensemble: percentiles replay exactly from the raw signals") {
    val rows = SparkEntry.queries("q125_quality_ensemble")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, p1, p2, p3, fused) =>
      assert(fused == p1 + p2 + p3, s"doc $id: fused is not the sum")
      Seq(p1, p2, p3).foreach(p => assert(p >= 0 && p <= 1000, s"doc $id: $p out of range"))
    }
    // exact local replay of one signal's CDF transform: recompute the
    // density percentile from scratch and compare doc-for-doc
    val docs = queries.Tables(spark, dir, "documents")
      .filter(length(col("text")) > 0)
      .select(col("doc_id"),
        floor(lit(1000.0) * length(replace(col("text"), lit(" "), lit(""))) /
          length(col("text"))).as("s1"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = docs.size
    val got = rows.map(r => r._1 -> r._2).toMap
    docs.foreach { case (id, s1) =>
      val cumLe = docs.values.count(_ <= s1)
      val want = math.floor(1000.0 * cumLe / total).toLong
      assert(got(id) == want, s"doc $id: p_s1 ${got(id)} != replayed $want")
    }
  }

  test("q58 sequence packing: pack ids are dense per source and tokens are conserved") {
    val rows = SparkEntry.queries("q58_seq_packing")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.groupBy(_._1).foreach { case (source, packs) =>
      val ids = packs.map(_._2).sorted
      assert(ids.sameElements(ids.head to ids.last),
        s"$source: pack ids must be contiguous, got ${ids.mkString(",")}")
      assert(ids.head == 0L, s"$source: first pack must be 0")
    }
    // total tokens across packs == total tokens in the corpus
    val totalPacked = rows.map(_._4).sum
    val totalCorpus = queries.Tables(spark, dir, "documents")
      .select(sum(size(split(col("text"), " ", -1)))).head.getLong(0)
    assert(totalPacked == totalCorpus, s"packing must conserve tokens: $totalPacked != $totalCorpus")
  }

  test("q59 decontamination: flags the planted near-dups of the eval slice and only real overlaps") {
    val rows = SparkEntry.queries("q59_decontam")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty, "corpus plants near-dups of early docs — some must be flagged")
    assert(rows.forall(_._1 >= 20), "eval docs themselves must never be flagged")
    assert(rows.forall(_._2 >= 1))
  }

  test("hashed-shingle decontamination matches the string-shingle form row for row") {
    // the promised 100 TB swap: 8-byte hashed shingles must make the SAME
    // contamination decisions (doc ids AND overlap counts) as q59's
    // oracle-checked string shingles — on both testdata corpora
    for (d <- Seq("/root/testdata/sf0.001", dir)) {
      val strForm = SparkEntry.queries("q59_decontam")(spark, d).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      val hashForm = graft.queries.Curation
        .hashedDecontam(graft.queries.Tables(spark, d, "documents"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(hashForm == strForm, s"$d: hashed=$hashForm vs string=$strForm")
    }
  }

  test("q142 ensemble filter keeps the smallest >=70% fused-ranked set per source") {
    import org.apache.spark.sql.functions._
    val docs = graft.queries.Tables(spark, dir, "documents")
    val rows = graft.queries.Curation.ensembleFilter(docs).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    rows.groupBy(_._1).foreach { case (src, g) =>
      val n = g.length
      val kept = g.count(_._4 == 1)
      val floor = math.ceil(0.7 * n).toLong
      assert(kept >= floor, s"$src: kept $kept < ceil(0.7*$n)")
      // keep rule is exactly fused >= thr, and dropping the boundary tie
      // group would fall below the floor (smallest qualifying set)
      val thr = g.head._3
      g.foreach { case (_, fused, t, k) =>
        assert(t == thr && k == (if (fused >= thr) 1 else 0))
      }
      val boundary = g.count(r => r._2 == thr && r._4 == 1)
      assert(kept - boundary < floor,
        s"$src: threshold not minimal (kept=$kept boundary=$boundary floor=$floor)")
    }
  }

  test("q136 daily ops report agrees with every stand-alone gauge, column for column") {
    import org.apache.spark.sql.functions._
    val docs = graft.queries.Tables(spark, dir, "documents")
    val base = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val batch = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
    val hist = graft.queries.Curation.scoreHistogram(base)
    val windows = graft.queries.Curation.windowStore(base)

    val report = graft.queries.Curation.dailyOpsReport(hist, windows, batch)
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap

    val drift = graft.queries.Curation.driftMonitor(hist, batch).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getString(4))).toMap
    val novelty = graft.queries.Curation.contentNovelty(windows, batch).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    val thr = graft.queries.Curation.incrementalThresholds(hist, batch).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap

    assert(report.keySet == drift.keySet, "report must cover exactly the drift gauge's sources")
    report.foreach { case (src, (status, nBase, nBatch, nov, t)) =>
      val (dBase, dBatch, dStatus) = drift(src)
      assert((status, nBase, nBatch) == ((dStatus, dBase, dBatch)), s"$src: drift columns diverge")
      assert(nov == novelty.getOrElse(src, -1L), s"$src: novelty column diverges")
      assert(t == thr.getOrElse(src, -1L), s"$src: threshold column diverges")
    }
  }

  test("q135 mixture sweep: grid rows anchor to the single-alpha solves; rates monotone in alpha") {
    import org.apache.spark.sql.functions._
    val docs = graft.queries.Tables(spark, dir, "documents")
    val sweep = graft.queries.Curation.mixtureSweep(docs).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    // the sqrt-exact anchors must equal the registered single-alpha solve
    // bit for bit (0.25/0.75 use a sqrt composition where the single-alpha
    // path uses libm pow — not ulp-comparable, so anchored by order only)
    for (a <- Seq(0.0, 0.5, 1.0)) {
      val single = graft.queries.Curation.temperatureMixture(docs, alpha = a)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
      single.foreach { case (src, row) =>
        assert(sweep(((a * 10000).toLong, src)) == row,
          s"alpha=$a source=$src: sweep row diverges from the single solve")
      }
    }
    // hotter alpha keeps more (ratio <= 1 so ratio^(1-alpha) is
    // non-decreasing in alpha), per source across the whole grid
    sweep.keys.map(_._2).toSeq.distinct.foreach { src =>
      val rates = Seq(0L, 2500L, 5000L, 7500L, 10000L).map(a => sweep((a, src))._1)
      assert(rates == rates.sorted, s"$src: rates must be monotone in alpha: $rates")
      assert(rates.last == 10000L)
    }
  }

  test("hashed-window novelty (q133) matches the string-window gauge row for row") {
    // the q59→q68 twin contract, for the novelty store: 8-byte XXH64
    // window keys must report the SAME per-source window/novel counts as
    // q124's oracle-checked string windows — on both testdata corpora
    import org.apache.spark.sql.functions._
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val docs = graft.queries.Tables(spark, d, "documents")
      val store = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
      val batch = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
      val strForm = graft.queries.Curation
        .contentNovelty(graft.queries.Curation.windowStore(store), batch)
        .collect().map(_.toSeq)
      val hashForm = graft.queries.Curation
        .hashedContentNovelty(graft.queries.Curation.hashedWindowStore(store), batch)
        .collect().map(_.toSeq)
      assert(hashForm.toSeq == strForm.toSeq,
        s"$d: hashed and string novelty gauges diverge")
    }
  }

  test("bloom-gated decontamination (q77) is bit-identical to the exact hashed form") {
    // one-sided error + exact verify ⇒ the bloom path must reproduce
    // hashedDecontam EXACTLY — including at fpp=0.5, where the pre-verify
    // candidate set is guaranteed polluted with false positives the verify
    // join must fully remove.
    for (d <- Seq(dir, "/root/testdata/sf0.01"); fpp <- Seq(0.01, 0.5)) {
      val docs = graft.queries.Tables(spark, d, "documents")
      val exact = graft.queries.Curation.hashedDecontam(docs)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val bloomed = graft.queries.Curation.bloomDecontam(docs, fpp = fpp)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(bloomed == exact, s"$d fpp=$fpp: bloom=$bloomed exact=$exact")
    }
  }

  test("q75 duplicated-span stats reproduce an exhaustive reference computation") {
    val texts = queries.Tables(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def windows(text: String): Set[String] = {
      val toks = text.split(" ", -1)
      if (toks.length < 5) Set(toks.mkString(" "))
      else toks.sliding(5).map(_.mkString(" ")).toSet
    }
    val perDoc = texts.map { case (id, t) => id -> windows(t) }
    val docFreq = perDoc.flatMap { case (id, ws) => ws.map(_ -> id) }
      .groupBy(_._1).map { case (w, hits) => w -> hits.map(_._2).toSet.size }
    val expected = perDoc.map { case (id, ws) =>
      val shared = ws.count(w => docFreq(w) >= 2)
      (id, ws.size.toLong, shared.toLong, shared.toDouble / ws.size)
    }.sortBy(_._1).toSeq
    val got = SparkEntry.queries("q75_dup_spans")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == expected, s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
    // the testdata near-dup plants must actually light the signal up
    assert(got.count(_._4 > 0) > 0, "corpus plants near-dups — some spans must be shared")
    assert(got.count(_._4 == 1.0) > 0, "fully-duplicated span docs must exist")
  }

  test("q78 chunking reproduces an exhaustive per-doc reference chunker exactly") {
    val texts = queries.Tables(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = texts.flatMap { case (id, text) =>
      val toks = text.split(" ", -1)
      val nChunks = (toks.length - 1) / 24 + 1
      (0 until nChunks).map { i =>
        val c = toks.slice(i * 24, math.min(i * 24 + 32, toks.length))
        (id, i.toLong, c.length.toLong, c.head, c.last)
      }
    }.sortBy(t => (t._1, t._2)).toSeq
    val got = SparkEntry.queries("q78_doc_chunking")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))
      .toSeq
    assert(got == expected,
      s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
  }

  test("q60 funnel: stage counts are monotonically non-increasing") {
    val rows = SparkEntry.queries("q60_funnel")(spark, dir).collect()
      .sortBy(_.getInt(1)).map(r => (r.getString(0), r.getLong(2)))
    assert(rows.map(_._1).sameElements(Seq("signup", "view", "click", "purchase")))
    val ns = rows.map(_._2)
    assert(ns.sliding(2).forall(p => p(0) >= p(1)),
      s"a later funnel stage cannot outnumber an earlier one: ${ns.mkString(",")}")
  }

  test("single-pass funnel walk (registered q60) equals the chained stage-join form exactly") {
    for (d <- Seq("/root/testdata/sf0.001", dir)) {
      val ev = graft.queries.Tables(spark, d, "events")
        .select("user_id", "event_type", "ts")
      val chained = graft.queries.Extras.funnelChained(ev).collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
      val onePass = SparkEntry.queries("q60_funnel")(spark, d).collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
      assert(onePass == chained, s"$d: onePass=$onePass chained=$chained")
    }
  }

  test("q61: chained-join form equals the registered single-pass form exactly") {
    // PLANS.md § "q61 settled": the single-pass form is registered for the
    // scan-dominated 100 TB regime, the chained form stays available for
    // small interactive slices — they must never disagree
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val ev = graft.queries.Tables(spark, d, "events")
        .select("user_id", "event_type", "ts")
      val sp = graft.queries.Curation.cohortSinglePass(ev).collect().map(_.toSeq).toSeq
      val ch = graft.queries.Curation.cohortChained(ev).collect().map(_.toSeq).toSeq
      assert(sp === ch, s"$d: the two cohort forms diverge")
    }
  }

  test("q61 cohort retention: every cell is bounded by its cohort's size") {
    val rows = SparkEntry.queries("q61_cohort_retention")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, off, _) => off >= 0 && off <= 4 })
    val cohortSizes = queries.Tables(spark, dir, "events")
      .filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(floor(unix_micros(col("ts")) / lit(604800000000L))).as("w0"))
      .groupBy("w0").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (cohort, off, n) =>
      assert(n <= cohortSizes(cohort),
        s"cohort $cohort offset $off: $n retained > ${cohortSizes(cohort)} signed up")
    }
  }

  test("q74 pipeline dispositions agree with every stand-alone stage query") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("q74_curation_pipeline")(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getInt(2), r.getString(3)))).toMap

    // stage 1: 'quality' ⟺ q64 says drop (for train docs)
    val q64Drop = SparkEntry.queries("q64_repetition_filter")(spark, dir).collect()
      .filter(r => r.getInt(4) == 0).map(_.getLong(0)).filter(_ >= 20).toSet
    assert(out.filter(_._2._2 == "quality").keySet == q64Drop)

    // stage 3: 'contaminated' docs all carry >= 1 shared shingle per q59
    val q59Flagged = SparkEntry.queries("q59_decontam")(spark, dir).collect()
      .map(_.getLong(0)).toSet
    val contaminated = out.filter(_._2._2 == "contaminated").keySet
    assert(contaminated.subsetOf(q59Flagged))

    // stage 4: every kept doc passes q57's keep rule; every 'sampled' drop fails it
    val docs = graft.queries.Tables(spark, dir, "documents")
    val keepBp = when(pmod(length(col("source")), lit(3)) === 0, 2500)
      .when(pmod(length(col("source")), lit(3)) === 1, 5000).otherwise(9000)
    val keepRule =
      pmod(pmod(col("doc_id"), lit(2147483647L)) * lit(2654435761L), lit(10000L)) < keepBp
    val passes = docs.select(col("doc_id"), keepRule.as("k")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    out.foreach { case (id, (kept, reason)) =>
      if (kept == 1) assert(passes(id), s"kept doc $id fails the sampling rule")
      if (reason == "sampled") assert(!passes(id), s"doc $id dropped as sampled but passes")
    }

    // disposition partitions the train set; reasons come from the fixed vocabulary
    assert(out.keySet ==
      docs.filter(col("doc_id") >= 20).select("doc_id").collect().map(_.getLong(0)).toSet)
    val vocab = Set("", "quality", "duplicate", "contaminated", "sampled")
    assert(out.values.map(_._2).toSet.subsetOf(vocab))
    assert(out.values.exists(_._1 == 1), "pipeline must keep something")
    assert(out.values.exists(_._1 == 0), "pipeline must drop something")
  }

  test("q109 temperature endpoints: alpha=0 equals q108 bit-identically, alpha=1 keeps everything") {
    val docs = graft.queries.Tables(spark, dir, "documents")

    // alpha=0 must reproduce the registered q108 equal-token solve EXACTLY
    // (same floating association, same floor) — whole rows, not just rates
    val q108 = graft.SparkEntry.registry("q108_mixture_rebalance")
      .fn(spark, dir).collect().map(_.toSeq).toSeq
    val alpha0 = graft.queries.Curation.temperatureMixture(docs, alpha = 0.0)
      .collect().map(_.toSeq).toSeq
    assert(alpha0 === q108, "alpha=0 must be q108's equal-token rebalance")

    // alpha=1 is the natural distribution: rate 10000 everywhere, nothing dropped
    val alpha1 = graft.queries.Curation.temperatureMixture(docs, alpha = 1.0).collect()
    alpha1.foreach { r =>
      assert(r.getAs[Long]("rate_bp") === 10000L)
      assert(r.getAs[Long]("n_kept") === r.getAs[Long]("n_total"),
        s"alpha=1 dropped docs in ${r.getAs[String]("source")}")
      assert(r.getAs[Long]("kept_tokens") === r.getAs[Long]("total_tokens"))
    }

    // 0 < alpha < 1 interpolates: every source's rate sits between the
    // alpha=0 and alpha=1 rates (monotone in alpha)
    val r0 = alpha0.map(s => s(0) -> s(1).asInstanceOf[Long]).toMap
    val rHalf = graft.queries.Curation.temperatureMixture(docs, alpha = 0.5).collect()
      .map(r => (r.getString(0): Any) -> r.getAs[Long]("rate_bp")).toMap
    rHalf.foreach { case (src, bp) =>
      assert(bp >= r0(src) && bp <= 10000L,
        s"alpha=0.5 rate $bp for $src outside [${r0(src)}, 10000]")
    }
  }

  test("q177 takedown verify: clean execution leaks zero; a planted leak is charged to its source") {
    val docs = graft.queries.Tables(spark, dir, "documents")
    val td = docs.filter(col("doc_id") % 97 === 0).select(col("doc_id"))
    val manifest = graft.queries.Release.incrementalRelease(spark, dir)
    val post = graft.queries.Release.takedownRelease(manifest, td)
      .localCheckpoint()
    val tdIds = td.collect().map(_.getLong(0)).toSet
    assert(tdIds.nonEmpty)

    // clean execution: zero live leaks everywhere; the flipped and
    // shielded counts reconcile exactly against the post manifest
    val v = graft.queries.Release.takedownVerify(post, td).collect()
    assert(v.map(_.getAs[Long]("n_live_leaks")).sum === 0L,
      "a correct takedown execution must verify leak-free")
    val postRows = post.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(5)))
    assert(v.map(_.getAs[Long]("n_taken_down")).sum ===
      postRows.count(_._3 == "taken_down").toLong)
    assert(v.map(_.getAs[Long]("n_shielded")).sum ===
      postRows.count(r => tdIds.contains(r._2) && r._3 == "revoked").toLong,
      "shielded = takedown docs whose dedup demotion already stands")
    // every takedown doc in the manifest is accounted: flipped or shielded
    assert(v.map(r => r.getAs[Long]("n_taken_down") + r.getAs[Long]("n_shielded")).sum ===
      postRows.count(r => tdIds.contains(r._2)).toLong)

    // planted leak: widen the takedown set by one LIVE published doc the
    // execution never saw — the verify against the unchanged manifest
    // must report exactly one leak, charged to that doc's source (robust
    // to a fixture where takedown ∩ keepers is empty: 'published' rows
    // always exist)
    import spark.implicits._
    val leak = postRows.find(_._3 == "published").get
    val td2 = td.unionByName(Seq(leak._2).toDF("doc_id"))
    val v2 = graft.queries.Release.takedownVerify(post, td2).collect()
    assert(v2.map(_.getAs[Long]("n_live_leaks")).sum === 1L)
    val charged = v2.filter(_.getAs[Long]("n_live_leaks") > 0)
    assert(charged.length === 1 && charged.head.getString(0) === leak._1,
      "the leak must be charged to the leaked doc's source")
  }
}
