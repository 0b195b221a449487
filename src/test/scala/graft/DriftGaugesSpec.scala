package graft

import org.apache.spark.sql.functions._

import graft.queries.{Similarity, TextAnalysis}

/** Value-level checks for the q127/q128 gauges on PLANTED fixtures — the
  * oracle proves cross-engine equality on the corpus; these prove the
  * gauges actually detect what they claim to detect (template text, a
  * cluster-population shift) when it is planted, and stay quiet when it
  * is absent.
  */
class DriftGaugesSpec extends SparkSpec {

  import spark.implicits._

  // ---- q127 boilerplate -------------------------------------------------

  test("boilerplate: a planted per-source header is flagged; unique text scores zero") {
    // src_t: 8 of 10 docs share a 4-token header (well above the 20% DF
    // floor); src_u: every doc fully unique
    val header = "subscribe to our newsletter"
    val docs = (
      (0 until 8).map(i => (i.toLong, s"$header unique$i body$i words$i here$i", "src_t")) ++
      Seq((8L, "totally distinct text one alpha", "src_t"),
          (9L, "totally different text two beta", "src_t")) ++
      (10 until 20).map(i => (i.toLong, s"unrelated$i standalone$i content$i block$i", "src_u"))
    ).toDF("doc_id", "text", "source")

    val out = TextAnalysis.boilerplateScore(docs, k = 2, dfFraction = 0.2)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap

    // header docs: the 3 header bigrams are boilerplate (DF 8/10 >= 2)
    (0 until 8).foreach { i =>
      val (nBp, permille) = out(i.toLong)
      assert(nBp >= 3, s"doc $i: header bigrams must be flagged (got $nBp)")
      assert(permille > 0)
    }
    // unique docs in BOTH sources score exactly zero
    (Seq(8L, 9L) ++ (10L until 20L)).foreach { i =>
      assert(out(i) == (0L, 0L), s"doc $i: unique text must score 0, got ${out(i)}")
    }
  }

  test("boilerplate: the DF floor is per-source — a window shared ACROSS sources is not boilerplate") {
    // the same bigram in 2/10 docs of each of two sources: per-source DF
    // 20% meets ceil(0.2*10)=2 only if >= 2 — plant it in exactly 1 doc
    // per source so a GLOBAL counter (2 occurrences) would flag it but
    // the per-source rule must not
    val docs = (
      Seq((0L, "shared phrase alpha beta", "s1"), (10L, "shared phrase gamma delta", "s2")) ++
      (1 until 10).map(i => (i.toLong, s"s1unique$i a$i b$i c$i", "s1")) ++
      (11 until 20).map(i => (i.toLong, s"s2unique$i x$i y$i z$i", "s2"))
    ).toDF("doc_id", "text", "source")
    val out = TextAnalysis.boilerplateScore(docs, k = 2, dfFraction = 0.2)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(0L) == 0L && out(10L) == 0L,
      "a cross-source coincidence must not count toward a per-source DF floor")
  }

  test("hashed-window boilerplate (q145) matches the string-window screen row for row") {
    // the q59→q68 / q124→q133 twin contract for the boilerplate gauge:
    // 8-byte XXH64 window keys through the DF aggregate must report the
    // SAME per-doc window/boilerplate counts as q127's oracle-checked
    // string windows — on both testdata corpora
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val docs = graft.queries.Tables(spark, d, "documents")
      val strForm = TextAnalysis.boilerplateScore(docs)
        .collect().map(_.toSeq)
      val hashForm = TextAnalysis.hashedBoilerplateScore(docs)
        .collect().map(_.toSeq)
      assert(hashForm.toSeq == strForm.toSeq,
        s"$d: hashed and string boilerplate screens diverge")
    }
  }

  // ---- q128 embedding drift --------------------------------------------

  private def vecs(rows: Seq[(Long, Array[Float])]) =
    rows.toDF("vec_id", "embedding")

  /** Two tight far-apart 64-d cluster centers; vec_id parity-independent. */
  private def point(cluster: Int, jitter: Int): Array[Float] = {
    val base = Array.fill(64)(0f)
    base(cluster) = 10f
    base(32 + cluster) = 10f
    base(63) = jitter * 0.01f
    base
  }

  test("embedding drift: batch redistributed toward one cluster flags `shift`; matched batch stays ok") {
    // stored side (vec_id%5!=0) split evenly between clusters 0 and 1;
    // batch side (vec_id%5==0) drawn ONLY from cluster 0 — a 50pp share
    // shift that must trip the 1/(2k) alarm at k=2
    val shifted = vecs(
      (0 until 40).filter(_ % 5 != 0).map(i => (i.toLong, point(i % 2, i))) ++
      (0 until 40).filter(_ % 5 == 0).map(i => (i.toLong, point(0, i))))
    val out = Similarity.embeddingDrift(shifted, k = 2, batchMod = 5)
      .collect().map(r => (r.getAs[Number](0).intValue, r.getAs[String]("status")))
    assert(out.exists(_._2 == "shift"),
      s"a one-sided batch must flag at least one cluster: ${out.toSeq}")

    // a batch drawn from the SAME mixture stays ok everywhere
    val matched = vecs((0 until 40).map(i => (i.toLong, point(i % 2, i))))
    val ok = Similarity.embeddingDrift(matched, k = 2, batchMod = 5)
      .collect().map(_.getAs[String]("status"))
    assert(ok.forall(_ == "ok"), s"matched mixture must not alarm: ${ok.toSeq}")
  }

  test("embedding drift: counts are an exact partition of the corpus") {
    val emb = vecs((0 until 40).map(i => (i.toLong, point(i % 2, i))))
    val rows = Similarity.embeddingDrift(emb, k = 2, batchMod = 5).collect()
    assert(rows.map(_.getLong(1)).sum == 32L) // 40 - 8 batch ids
    assert(rows.map(_.getLong(2)).sum == 8L)
  }

  // ---- q130 threshold sweep --------------------------------------------

  test("threshold sweep: conserved totals, monotone counts, degenerate endpoints") {
    val docs = graft.queries.Tables(spark, "/root/testdata/sf0.001", "documents")
    val rows = graft.queries.Curation.thresholdCalibration(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(rows.length == 11)
    // every threshold partitions the same labeled corpus
    val totals = rows.map { case (_, tp, fp, fn, tn) => (tp + fn, fp + tn) }.distinct
    assert(totals.length == 1, s"junk/clean totals must not vary with thr: $totals")
    // raising the threshold can only shrink the predicted-positive side
    rows.sliding(2).foreach { case Array((_, tp0, fp0, _, _), (t1, tp1, fp1, _, _)) =>
      assert(tp1 <= tp0 && fp1 <= fp0, s"counts must be monotone at thr=$t1")
    }
    // thr=0: everything predicted junk (every score >= 0)
    val (_, tp0, fp0, fn0, tn0) = rows.head
    assert(fn0 == 0 && tn0 == 0 && tp0 > 0 && fp0 > 0)
  }

  // ---- q137 KS drift ---------------------------------------------------

  test("KS drift: identical distribution scores zero; a one-bucket shift maxes the statistic") {
    // densityScore("a a") = floor(1000*2/3) = 666; densityScore("aa") = 1000
    val stored = Seq(
      ("src_same", 666L, 10L), ("src_shift", 666L, 10L)
    ).toDF("source", "score", "n")
    val batch = (
      (1 to 5).map(i => (i.toLong, "src_same", "a a")) ++
      (6 to 10).map(i => (i.toLong, "src_shift", "aa"))
    ).toDF("doc_id", "source", "text")
    val out = graft.queries.Curation.ksDrift(stored, batch)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(out("src_same") == ((10L, 5L, 0L, "ok")))
    // whole mass moved one bucket: at score 666 the CDF gap is 1,
    // ks_scaled = n_base * n_batch = 50 -> drift
    assert(out("src_shift") == ((10L, 5L, 50L, "drift")))
  }

  // ---- q138 session gap sweep ------------------------------------------

  test("session gap sweep: session counts respond to the grid exactly on planted gaps") {
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def at(min: Long) = new java.sql.Timestamp(base.getTime + min * 60000L)
    // user 1: events at 0, 10, 50, 200 min -> gaps 10, 40, 150
    // user 2: single event -> always exactly 1 session
    val events = Seq(
      (1L, 1L, at(0)), (2L, 1L, at(10)), (3L, 1L, at(50)), (4L, 1L, at(200)),
      (5L, 2L, at(0))
    ).toDF("event_id", "user_id", "ts")
    // replicate the registered per-event-gap + grid-fanout computation on
    // the planted frame (the registry form is bound to the events table)
    val out = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      events
        .select(col("user_id"),
          (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)).as("gap_us"))
        .select(col("user_id"), col("gap_us"),
          explode(array(Seq(5L, 30L, 60L, 120L).map(lit): _*)).as("gap_min"))
        .groupBy("gap_min")
        .agg(sum(when(col("gap_us").isNull ||
          col("gap_us") > col("gap_min") * lit(60000000L), 1L).otherwise(0L)).as("n_sessions"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    // user 1 sessions per gap: 5min -> 4, 30 -> 3, 60 -> 2, 120 -> 2; +1 for user 2
    assert(out == Map(5L -> 5L, 30L -> 4L, 60L -> 3L, 120L -> 3L), s"got $out")
  }

  // ---- q141 volume anomaly ---------------------------------------------

  test("volume anomaly: a silent gap flags low, a spike flags high, steady hours stay quiet") {
    def at(h: Long, i: Int) = new java.sql.Timestamp(h * 3600000L + i)
    // type g: 12 hours of 10 events, hour 4 EMPTY — sigma~2.8, the gap's
    // 9.2 deviation flags low. type s: 12 hours of 10, hour 9 = 100 —
    // sigma~24.9, only the spike's 82.5 deviation flags. (One combined
    // type would NOT flag the gap: the spike inflates sigma past it —
    // which is why the screen is per-type.)
    val rows =
      (0L until 12L).filterNot(_ == 4L).flatMap { h =>
        (0 until 10).map(i => (h * 1000 + i, "g", at(h, i)))
      } ++
      (0L until 12L).flatMap { h =>
        val n = if (h == 9L) 100 else 10
        (0 until n).map(i => (100000 + h * 1000 + i, "s", at(h, i)))
      }
    val events = rows.toDF("event_id", "event_type", "ts")
    val out = graft.queries.Relational.volumeAnomaly(events)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getString(3))).toMap
    assert(out.get(("g", 4L)).contains((0L, "low")), s"gap must flag low: $out")
    assert(out.get(("s", 9L)).contains((100L, "high")), s"spike must flag high: $out")
    assert(out.keySet == Set(("g", 4L), ("s", 9L)), s"steady hours must stay quiet: $out")
  }

  // ---- q134 normalized dedup -------------------------------------------

  test("normalized dedup: case/whitespace and masked-email variants group; distinct content never") {
    val docs = Seq(
      (1L, "hello spark world"),
      (2L, "  HELLO   Spark    WORLD "),            // case+ws variant of 1
      (3L, "reach me at alice@example.com today"),
      (4L, "reach me at bob@other.org today"),      // mask variant of 3
      (5L, "reach me at https://a.example/x today"),// url != email mask: no group
      (6L, "completely unrelated content here")
    ).toDF("doc_id", "text")
    val out = graft.queries.Dedup.normalizedDedup(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out === Set((1L, 1L, 2L), (2L, 1L, 2L), (3L, 3L, 2L), (4L, 3L, 2L)),
      s"got $out")
  }

  // ---- q132 snapshot diff ----------------------------------------------

  test("snapshot diff: identical snapshots all-unchanged; planted edits counted exactly") {
    val v0 = Seq(
      (1L, "s", "alpha"), (2L, "s", "beta"), (3L, "s", "gamma"), (4L, "s", "delta")
    ).toDF("doc_id", "source", "text")
    val same = graft.queries.Curation.snapshotDiff(v0, v0).collect()
    assert(same.map(_.toSeq) === Array(Seq("s", 4L, 0L, 0L, 0L)))

    val v1 = Seq(
      (1L, "s", "alpha"),          // unchanged
      (2L, "s", "BETA CHANGED"),   // changed
      // 3 removed
      (4L, "s", "delta"),          // unchanged
      (9L, "s", "brand new")       // added
    ).toDF("doc_id", "source", "text")
    val diff = graft.queries.Curation.snapshotDiff(v0, v1).collect()
    assert(diff.map(_.toSeq) === Array(Seq("s", 2L, 1L, 1L, 1L)))

    // round-trip (q140): applying the diff as a CDC feed to v0 lands on
    // exactly v1 — snapshotDiff(applied, v1) reports all-unchanged
    val feed = Seq(
      (3L, "s", "gamma", "delete"),
      (2L, "s", "BETA CHANGED", "upsert"),
      (9L, "s", "brand new", "upsert")
    ).toDF("doc_id", "source", "text", "op")
    val applied = graft.queries.Curation.applyChanges(v0, feed)
    val roundTrip = graft.queries.Curation.snapshotDiff(applied, v1).collect()
    assert(roundTrip.map(_.toSeq) === Array(Seq("s", 4L, 0L, 0L, 0L)),
      "apply(diff(v0,v1)) must reproduce v1 exactly")
  }
}
