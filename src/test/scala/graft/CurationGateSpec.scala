package graft

import org.apache.spark.sql.functions._

import graft.queries.Tables

/** Round-8 curation additions: q91 cluster representatives, q92 quality
  * gate, q93 stratified token sample. All three are oracle-checked (value
  * hashes) — this spec pins the SEMANTIC contracts the hash can't express:
  * representative optimality, rule discrimination, and the prefix property
  * of the budget sample.
  */
class CurationGateSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("q91: same components as q55, exactly one keep per cluster, keep maximizes (n_chars, -doc_id)") {
    val q55 = SparkEntry.queries("q55_dedup_clusters")(spark, dir).collect()
      .map(r => r.getLong(1) -> r.getLong(0)).toMap
    val rep = SparkEntry.queries("q91_cluster_rep")(spark, dir).collect()
    assert(rep.length == q55.size)
    rep.foreach { r =>
      assert(q55(r.getLong(1)) == r.getLong(0), s"cluster drift at doc ${r.getLong(1)}")
    }
    val byCluster = rep.groupBy(_.getLong(0))
    assert(byCluster.exists(_._2.length > 1), "fixture must contain non-trivial clusters")
    byCluster.foreach { case (cid, members) =>
      val keeps = members.filter(_.getInt(3) == 1)
      assert(keeps.length == 1, s"cluster $cid has ${keeps.length} keeps")
      val kept = keeps.head
      val best = members.maxBy(m => (m.getLong(2), -m.getLong(1)))
      assert(kept.getLong(1) == best.getLong(1),
        s"cluster $cid kept ${kept.getLong(1)} but best is ${best.getLong(1)}")
    }
    // the quality rule must actually differ from q55's min-id rule somewhere
    val minIdKeeps = rep.filter(r => r.getLong(0) == r.getLong(1)).map(_.getLong(1)).toSet
    val qualityKeeps = rep.filter(_.getInt(3) == 1).map(_.getLong(1)).toSet
    assert(qualityKeeps != minIdKeeps,
      "fixture degenerate: quality ranking picked exactly the min ids")
  }

  test("q92: flags recompute from signals, pass is the conjunction, rules discriminate") {
    val out = SparkEntry.queries("q92_quality_rules")(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (nWords, meanWlen) = (r.getLong(1), r.getDouble(2))
      val (uniq, stops) = (r.getDouble(3), r.getLong(4))
      val flags = Seq(r.getInt(5), r.getInt(6), r.getInt(7), r.getInt(8))
      val expect = Seq(
        nWords >= 30 && nWords <= 120,
        meanWlen >= 3 && meanWlen <= 10,
        uniq >= 0.5,
        stops >= 2).map(b => if (b) 1 else 0)
      assert(flags == expect, s"doc ${r.getLong(0)}: flags $flags != $expect")
      assert(r.getInt(9) == flags.product, s"doc ${r.getLong(0)}: pass is not the conjunction")
    }
    val passed = out.count(_.getInt(9) == 1)
    assert(passed > 0 && passed < out.length,
      s"gate must discriminate on the fixture corpus (passed $passed/${out.length})")
  }

  test("q97: minhash pairs share clusters, one quality-ranked keep per cluster") {
    val docs = Tables(spark, dir, "documents")
    val out = SparkEntry.queries("q97_dedup_manifest")(spark, dir).collect()
    assert(out.length == docs.count())
    val cluster = out.map(r => r.getLong(1) -> r.getLong(0)).toMap
    // every verified minhash pair must land in the same component
    val pairs = graft.queries.Dedup.minhashPairs(docs, threshold = 0.7)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture must contain minhash near-dups")
    pairs.foreach { case (a, b) =>
      assert(cluster(a) == cluster(b), s"pair ($a,$b) split across clusters")
    }
    // exactly one keep per cluster, and it maximizes (n_chars, -doc_id)
    out.groupBy(_.getLong(0)).foreach { case (cid, members) =>
      val keeps = members.filter(_.getInt(3) == 1)
      assert(keeps.length == 1, s"cluster $cid has ${keeps.length} keeps")
      val best = members.maxBy(m => (m.getLong(2), -m.getLong(1)))
      assert(keeps.head.getLong(1) == best.getLong(1), s"cluster $cid kept a non-best doc")
    }
  }

  test("q122 tiers: exact before near, canonical chains resolve, keepers equal q97's") {
    val docs = Tables(spark, dir, "documents")
    val out = SparkEntry.queries("q122_dedup_tiers")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.length == docs.count())
    val byId = out.map(t => t._1 -> t).toMap
    val fps = docs.select(col("doc_id"),
        graft.functions.Text.fingerprint(col("text")).as("f")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { case (id, tier, canonical) =>
      // a canonical is always a kept doc (chains fully resolve)
      assert(byId(canonical)._2 == "keep", s"doc $id canonical $canonical is not kept")
      tier match {
        case "exact_dup" =>
          // an exact dup shares its fingerprint with SOME earlier doc
          assert(out.exists(o => o._1 < id && fps(o._1) == fps(id)),
            s"doc $id tagged exact_dup but its fingerprint is first-seen")
        case "keep" =>
          assert(canonical == id, s"kept doc $id must be its own canonical")
        case "near_dup" =>
          assert(canonical != id)
        case other => fail(s"doc $id: unknown tier $other")
      }
    }
    // the live corpus has no verbatim copies (checked: distinct
    // fingerprints == docs), so the exact tier is exercised on a PLANTED
    // corpus below; the near tier must fire on the live one
    assert(out.exists(_._2 == "near_dup"), "fixture must exercise the near tier")

    // planted: two verbatim copies of doc 0's text and one of doc 1's —
    // copies must tag exact_dup and resolve to their group's first-seen
    // rep's final canonical
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    import spark.implicits._
    val planted = docs.select(col("doc_id"), col("text"), col("n_chars"))
      .unionByName(Seq(
        (9001L, texts(0L), texts(0L).length.toLong),
        (9002L, texts(0L), texts(0L).length.toLong),
        (9003L, texts(1L), texts(1L).length.toLong))
        .toDF("doc_id", "text", "n_chars"))
    val planted122 = graft.queries.Dedup.dedupTiers(planted).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    Seq(9001L, 9002L, 9003L).foreach { id =>
      assert(planted122(id)._1 == "exact_dup", s"planted copy $id must tag exact_dup")
    }
    assert(planted122(9001L)._2 == planted122(0L)._2 &&
      planted122(9002L)._2 == planted122(0L)._2,
      "copies of doc 0 must resolve to doc 0's final canonical")
    assert(planted122(9003L)._2 == planted122(1L)._2,
      "the copy of doc 1 must resolve to doc 1's final canonical")
    // cross-query consistency: verbatim copies are jaccard-1 near-dups, so
    // running the near tier AFTER the exact tier must keep exactly the
    // same final set as q97's single near-dup pass over the full corpus
    // (within an fp-group n_chars ties and the rep is the min id, so the
    // ranking rule picks the same winners)
    val q97Keep = SparkEntry.queries("q97_dedup_manifest")(spark, dir).collect()
      .filter(_.getInt(3) == 1).map(_.getLong(1)).toSet
    val tierKeep = out.filter(_._2 == "keep").map(_._1).toSet
    assert(tierKeep == q97Keep,
      s"tiered keep-set diverges from q97: ${(tierKeep diff q97Keep).take(5)} / ${(q97Keep diff tierKeep).take(5)}")
  }

  test("q98: cluster matches q96, flag recomputes from the distance stats") {
    val out = SparkEntry.queries("q98_embed_outliers")(spark, dir).collect()
    val q96 = SparkEntry.queries("q96_kmeans")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.length == q96.size)
    out.foreach(r => assert(q96(r.getLong(0)) == r.getLong(1),
      s"vec ${r.getLong(0)}: q98 cluster disagrees with q96"))
    val dists = out.map(_.getDouble(2))
    val mu = dists.sum / dists.length
    val m2 = dists.map(d => d * d).sum / dists.length
    val thresh = mu + 2 * math.sqrt(math.max(m2 - mu * mu, 0))
    out.foreach { r =>
      // recompute with double sums: agreement within the decimal/double
      // accumulation gap (exact only near the boundary, hence the margin)
      val d = r.getDouble(2)
      if (math.abs(d - thresh) > 1e-9)
        assert((r.getInt(3) == 1) == (d > thresh), s"vec ${r.getLong(0)}: flag mismatch")
    }
    val n = out.count(_.getInt(3) == 1)
    assert(n >= 1 && n <= out.length / 10,
      s"outlier screen must discriminate sparsely, flagged $n/${out.length}")
  }

  test("q99: fertility >= 1 everywhere and totals recompute from the q90 encode") {
    val out = SparkEntry.queries("q99_bpe_fertility")(spark, dir).collect()
    assert(out.length == 20)
    out.foreach { r =>
      val (w, t, f) = (r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(t >= w, s"${r.getString(0)}: fewer tokens than words")
      assert(math.abs(f - t.toDouble / w) < 1e-15)
    }
    // cross-check one source's totals against a direct per-doc count over
    // the encoded strings themselves
    val enc = Tables(spark, dir, "documents").filter(col("source") === "src0")
      .select(graft.queries.TextAnalysis.bpeEncode(col("text")).as("e"),
        graft.functions.Text.tokenCountPortable(col("text")).as("w"))
      .collect()
    assert(enc.nonEmpty)
    val directTokens = enc.map(r => r.getString(0).count(_ == '<').toLong).sum
    val directWords = enc.map(_.getLong(1)).sum
    val row = out.find(_.getString(0) == "src0").get
    assert(row.getLong(1) == enc.length)
    assert(row.getLong(2) == directWords, s"words ${row.getLong(2)} != $directWords")
    assert(row.getLong(3) == directTokens, s"tokens ${row.getLong(3)} != $directTokens")
  }

  test("q101: compression ratio discriminates repetition and is deterministic") {
    import spark.implicits._
    val fixtures = Seq(
      (0L, Array.fill(200)("spam").mkString(" ")), // pure repetition
      (1L, (0 until 200).map(i => s"w${i * 7919}").mkString(" ")), // high entropy
      (2L, ""))
      .toDF("doc_id", "text")
    val out = graft.queries.TextAnalysis.compressionRatio(fixtures).collect()
    val byId = out.map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(byId(0L) < byId(1L) / 2,
      s"repetitive text must deflate far smaller: ${byId(0L)} vs ${byId(1L)}")
    assert(byId(2L) == 0.0, "empty text reports ratio 0")
    // deterministic across reruns and partitionings
    val again = graft.queries.TextAnalysis
      .compressionRatio(fixtures.repartition(3)).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(again == byId, "ratio must not depend on partitioning or rerun")
    // real corpus: every ratio positive, n_deflate consistent
    val corpus = SparkEntry.queries("q101_compress_ratio")(spark, dir).collect()
    assert(corpus.length == 500)
    corpus.foreach { r =>
      assert(r.getLong(1) > 0 && r.getLong(2) > 0 && r.getDouble(3) > 0)
    }
  }

  test("q102: every sketch quantile sits inside the exact neighboring order statistics") {
    val approx = SparkEntry.queries("q102_quantile_sketch")(spark, dir).collect()
    val exactBySource = Tables(spark, dir, "documents")
      .select("source", "n_chars").collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(1).toDouble).sorted).toMap
    assert(approx.length == exactBySource.size)
    approx.foreach { r =>
      val xs = exactBySource(r.getString(0))
      assert(r.getLong(1) == xs.length)
      Seq(0.25 -> r.getDouble(2), 0.50 -> r.getDouble(3),
        0.75 -> r.getDouble(4), 0.95 -> r.getDouble(5)).foreach { case (p, v) =>
        // GK contract at accuracy >> n: the reported value IS one of the
        // order statistics adjacent to the target rank
        val rank = (p * (xs.length - 1)).toInt
        val lo = xs(math.max(rank - 1, 0))
        val hi = xs(math.min(rank + 2, xs.length - 1))
        assert(v >= lo && v <= hi,
          s"${r.getString(0)} p$p: $v outside [$lo, $hi]")
      }
    }
  }

  test("q103: repair agrees with the q82 audit and only eval docs move to train") {
    val audit = SparkEntry.queries("q82_split_contam")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap // doc_id -> n_hit
    val out = SparkEntry.queries("q103_split_decontam")(spark, dir).collect()
    assert(out.length == 500)
    var moved = 0
    out.foreach { r =>
      val (id, orig, fin, m) =
        (r.getLong(0), r.getString(1), r.getString(2), r.getInt(3))
      val contaminated = audit.getOrElse(id, 0L) > 0
      if (orig == "train") {
        assert(fin == "train" && m == 0, s"train doc $id must not move")
      } else {
        assert((m == 1) == contaminated, s"doc $id: moved flag disagrees with audit")
        assert(fin == (if (contaminated) "train" else orig))
      }
      moved += m
    }
    assert(moved > 0, "fixture corpus must contain cross-split leaks (q82 comment: 13 at sf0.01)")
    // post-repair invariant: re-auditing the FINAL split finds zero
    // contaminated eval docs among the moved set (they are train now)
    val finalEval = out.filter(_.getString(2) != "train").map(_.getLong(0)).toSet
    assert(finalEval.forall(id => audit.getOrElse(id, 0L) == 0L),
      "a contaminated doc survived in the final eval split")
  }

  test("q93: kept docs are an md5-order prefix per source and the budget is a floor") {
    val budget = 600L
    val out = SparkEntry.queries("q93_stratified_sample")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    out.groupBy(_._1).foreach { case (source, rows) =>
      val inOrder = rows.sortBy(_._4) // cum_toks ascending == md5 order
      // cumulative sums re-add
      inOrder.foldLeft(0L) { case (acc, (_, _, n, cum, _)) =>
        assert(cum == acc + n, s"$source: cumulative sum drift at cum=$cum")
        cum
      }
      // kept rows form a prefix
      val keptFlags = inOrder.map(_._5)
      assert(!keptFlags.dropWhile(_ == 1).contains(1), s"$source: kept set is not a prefix")
      val keptToks = inOrder.filter(_._5 == 1).map(_._3).sum
      val totalToks = inOrder.map(_._3).sum
      assert(keptToks >= math.min(budget, totalToks), s"$source: budget not met ($keptToks)")
      // take-until-crossing: dropping the LAST kept doc must go under budget
      val lastKept = inOrder.filter(_._5 == 1).lastOption
      lastKept.foreach { case (_, _, n, _, _) =>
        if (keptToks - n >= budget) fail(s"$source: kept past the crossing doc")
      }
      // and the sample must be a real subset somewhere
      assert(keptFlags.contains(0) || totalToks <= budget,
        s"$source: nothing was excluded despite exceeding the budget")
    }
  }

  test("q114: strata are exactly q96's clusters and kept docs are an md5-order prefix per cluster") {
    val budget = 600L
    val q96 = SparkEntry.queries("q96_kmeans")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getAs[Number](1).longValue()).toMap
    val out = SparkEntry.queries("q114_cluster_sample")(spark, dir).collect()
      .map(r => (r.getAs[Number](0).longValue(), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    // every doc sampled under exactly its q96 cluster, all docs covered
    assert(out.length === q96.size)
    out.foreach { case (cid, id, _, _, _) =>
      assert(q96(id) === cid, s"doc $id sampled under $cid but q96 assigns ${q96(id)}")
    }
    // per cluster: cumulative sums re-add, kept is a prefix, budget is a
    // floor with take-until-crossing semantics (the q93 contract verbatim)
    out.groupBy(_._1).foreach { case (cid, rows) =>
      val inOrder = rows.sortBy(_._4)
      inOrder.foldLeft(0L) { case (acc, (_, _, n, cum, _)) =>
        assert(cum == acc + n, s"cluster $cid: cumulative drift at $cum"); cum
      }
      val flags = inOrder.map(_._5)
      assert(!flags.dropWhile(_ == 1).contains(1), s"cluster $cid: kept not a prefix")
      val keptToks = inOrder.filter(_._5 == 1).map(_._3).sum
      val totalToks = inOrder.map(_._3).sum
      assert(keptToks >= math.min(budget, totalToks), s"cluster $cid: budget not met")
      inOrder.filter(_._5 == 1).lastOption.foreach { case (_, _, n, _, _) =>
        if (keptToks - n >= budget) fail(s"cluster $cid: kept past the crossing doc")
      }
    }
    // the stratification must be non-trivial: >1 cluster, and some cluster excludes docs
    assert(out.map(_._1).distinct.length > 1)
    assert(out.exists(_._5 == 0), "some doc must be excluded somewhere")
  }

  test("q111: every disposition agrees with its stand-alone stage query") {
    val out = SparkEntry.queries("q111_neardup_curation")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getInt(2), r.getString(3))).toMap
    val docs = Tables(spark, dir, "documents")

    // stage 1 — quality: same rule family as q74 (dup-word + top-bigram
    // fractions); recompute independently from q64's registered output
    val q64 = SparkEntry.queries("q64_repetition_filter")(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Double]("dup_word_frac") <= 0.6 && r.getAs[Double]("top_bigram_frac") <= 0.08))
      .toMap
    out.foreach { case (id, (_, reason)) =>
      if (reason == "quality") assert(!q64(id), s"doc $id dropped as quality but passes q64")
      else assert(q64(id), s"doc $id not quality-dropped but fails the q64 rule")
    }

    // stage 2 — near-dup: 'duplicate' drops are exactly the keep=0 rows of
    // a stand-alone q97-style manifest over the quality survivors
    val survIds = out.collect { case (id, (_, r)) if r != "quality" => id }.toSet
    val surv = docs.filter(col("doc_id") >= 20)
      .filter(col("doc_id").isin(survIds.toSeq: _*))
      .select("doc_id", "text", "source", "n_chars")
    val manifest = graft.queries.Dedup.dedupManifest(surv).collect()
      .map(r => r.getLong(1) -> r.getInt(3)).toMap
    out.foreach { case (id, (_, reason)) =>
      if (reason == "duplicate")
        assert(manifest(id) == 0, s"doc $id dropped as duplicate but q97 keeps it")
      else if (reason != "quality")
        assert(manifest(id) == 1, s"doc $id survived dedup but q97 drops it")
    }
    assert(out.values.exists(_._2 == "duplicate"),
      "fixture corpus plants near-dups — the manifest stage must drop some")

    // stages 3/4 — decontamination (q59's flags) and sampling (q57's rule),
    // in disposition order
    val contam = SparkEntry.queries("q59_decontam")(spark, dir).collect()
      .map(_.getLong(0)).toSet
    val passesSampling = docs.select(col("doc_id"),
      (pmod(pmod(col("doc_id"), lit(2147483647L)) * lit(2654435761L), lit(10000L)) <
        when(pmod(length(col("source")), lit(3)) === 0, 2500)
          .when(pmod(length(col("source")), lit(3)) === 1, 5000)
          .otherwise(9000)).as("p"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    out.foreach { case (id, (kept, reason)) =>
      reason match {
        case "contaminated" => assert(contam.contains(id))
        case "sampled" => assert(!contam.contains(id) && !passesSampling(id))
        case "" => assert(kept == 1 && !contam.contains(id) && passesSampling(id))
        case _ => ()
      }
    }
  }
}
