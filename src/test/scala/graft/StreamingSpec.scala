package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

import graft.gen.Findings
import graft.streaming.ConvertStream

class StreamingSpec extends SparkSpec {

  test("file stream converts each arriving ndjson.gz to its own sorted parquet") {
    val root = Files.createTempDirectory("graft-stream").toString
    val srcDir = s"$root/in"
    val outDir = s"$root/out"
    new java.io.File(srcDir).mkdirs()

    // two files "arriving" — distinct stems, the event-per-file model
    val (sorted, unsorted) = Findings.writeFixtures(srcDir, n = 200)
    val schema = spark.read.json(sorted).schema

    val q = ConvertStream.start(spark, srcDir, outDir, schema)
    q.awaitTermination(120000)

    val a = spark.read.parquet(s"$outDir/finding-sorted.zst.parquet")
    val b = spark.read.parquet(s"$outDir/finding-unsorted.zst.parquet")
    assert(a.count() == 200 && b.count() == 200)
    assert(a.schema("time_dt").dataType == TimestampType)
    val times = b.select("time").collect().map(_.getLong(0))
    assert(times.sliding(2).forall(p => p(0) <= p(1)), "per-file output globally sorted")
  }

  test("source file names with spaces and percent signs keep their stems") {
    val root = Files.createTempDirectory("graft-stream-uri").toString
    val srcDir = s"$root/in"
    val outDir = s"$root/out"
    new java.io.File(srcDir).mkdirs()

    val (sorted, unsorted) = Findings.writeFixtures(srcDir, n = 20)
    val schema = spark.read.json(sorted).schema
    // input_file_name() returns a percent-encoded URI: without decoding,
    // "my data" would write "my%20data" and "a%b" would write "a%25b"
    new java.io.File(sorted).renameTo(new java.io.File(s"$srcDir/my data.ndjson.gz"))
    new java.io.File(unsorted).renameTo(new java.io.File(s"$srcDir/a%b.ndjson.gz"))

    val q = ConvertStream.start(spark, srcDir, outDir, schema)
    q.awaitTermination(120000)

    assert(spark.read.parquet(s"$outDir/my data.zst.parquet").count() == 20)
    assert(spark.read.parquet(s"$outDir/a%b.zst.parquet").count() == 20)
  }

  test("restarted convert stream resumes from checkpoint without reprocessing") {
    val root = Files.createTempDirectory("graft-stream-ckpt").toString
    val srcDir = s"$root/in"; val outDir = s"$root/out"
    val ckpt = s"$root/ckpt"
    new java.io.File(srcDir).mkdirs()

    val (sortedPath, _) = Findings.writeFixtures(srcDir, n = 100)
    val schema = spark.read.json(sortedPath).schema
    new java.io.File(s"$srcDir/finding-unsorted.ndjson.gz").delete() // one file first

    val q1 = ConvertStream.start(spark, srcDir, outDir, schema, checkpoint = Some(ckpt))
    q1.awaitTermination(120000)
    val outA = new java.io.File(s"$outDir/finding-sorted.zst.parquet")
    assert(outA.exists)
    val mtimeA = outA.lastModified()

    // second file arrives while the stream is DOWN; restart from checkpoint
    Findings.writeFixtures(srcDir, n = 100)
    val q2 = ConvertStream.start(spark, srcDir, outDir, schema, checkpoint = Some(ckpt))
    q2.awaitTermination(120000)

    assert(spark.read.parquet(s"$outDir/finding-unsorted.zst.parquet").count() == 100,
      "file that arrived during downtime must be converted on restart")
    assert(outA.lastModified() == mtimeA,
      "already-converted file must NOT be reprocessed after restart")
  }

  test("stateful streaming sessionization closes sessions on gap and on watermark timeout") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.SessionizeStream
    import graft.streaming.SessionizeStream.Event

    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val enc: org.apache.spark.sql.Encoder[Event] =
      org.apache.spark.sql.Encoders.product[Event]

    val t0 = 1700000000000L // fixed epoch ms
    def ev(u: Long, id: Long, minutes: Long) =
      Event(u, id, new Timestamp(t0 + minutes * 60000))

    val input = MemoryStream[Event]
    val q = SessionizeStream.start(spark, input.toDF(), queryName = "sessions_t",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))

    // session 0: two events 5 min apart; then a 120-min gap breaks it
    input.addData(ev(1, 10, 0), ev(1, 11, 5))
    q.processAllAvailable()
    input.addData(ev(1, 12, 125))
    q.processAllAvailable()

    val closed = spark.table("sessions_t")
      .select("user_id", "session_seq", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(closed.contains((1L, 0L, 2L)),
      s"gap must close session 0 with 2 events, got ${closed.mkString(",")}")

    // watermark far past the open session's last event → event-time timeout
    input.addData(ev(99, 1, 100000))
    q.processAllAvailable()
    input.addData(ev(99, 2, 100001)) // one more batch so the timeout fires
    q.processAllAvailable()
    val after = spark.table("sessions_t")
      .select("user_id", "session_seq", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(after.contains((1L, 1L, 1L)),
      s"timeout must close session 1 (the single event at +125min), got ${after.mkString(",")}")
    q.stop()
  }

  test("watermarked tumbling-window aggregation finalizes windows in append mode") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.EventAggStream

    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val enc: org.apache.spark.sql.Encoder[(Timestamp, String, Double)] =
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.TIMESTAMP,
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaDouble)

    val h0 = 1700000000000L - (1700000000000L % 3600000) // aligned hour start
    def ev(minutes: Long, typ: String, v: Double) =
      (new Timestamp(h0 + minutes * 60000), typ, v)

    val input = MemoryStream[(Timestamp, String, Double)]
    val q = EventAggStream.start(
      input.toDF().toDF("ts", "event_type", "value"), queryName = "win_t",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))

    input.addData(ev(5, "click", 1.0), ev(25, "click", 2.0), ev(40, "view", 5.0))
    q.processAllAvailable()
    // watermark (10 min) must pass hour0's end before the window finalizes
    input.addData(ev(200, "click", 9.0))
    q.processAllAvailable()
    input.addData(ev(201, "click", 9.0)) // extra batch so the new watermark applies
    q.processAllAvailable()

    val rows = spark.table("win_t")
      .select("window_start", "event_type", "n", "sum_value").collect()
      .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.contains((h0, "click", 2L, 3.0)),
      s"hour-0 click window must finalize with n=2 sum=3.0, got ${rows.mkString(",")}")
    assert(rows.contains((h0, "view", 1L, 5.0)))
    q.stop()
  }

  test("streaming top-k tokens: SpaceSaving partials merge across batches per window") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.TopTokensStream

    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val enc: org.apache.spark.sql.Encoder[(Timestamp, String)] =
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.TIMESTAMP,
        org.apache.spark.sql.Encoders.STRING)

    val m0 = 1700000000000L - (1700000000000L % 60000) // aligned minute start
    def doc(sec: Long, text: String) = (new Timestamp(m0 + sec * 1000), text)

    val input = MemoryStream[(Timestamp, String)]
    val q = TopTokensStream.start(
      input.toDF().toDF("ts", "text"), queryName = "toptok_t", k = 3,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))

    // the SAME window fed across TWO batches: counts must merge, not reset
    input.addData(doc(5, "alpha alpha beta"), doc(10, "alpha gamma"))
    q.processAllAvailable()
    input.addData(doc(20, "beta beta beta alpha"))
    q.processAllAvailable()
    // advance the watermark (10 min) past the window end to finalize it
    input.addData(doc(800, "later"))
    q.processAllAvailable()
    input.addData(doc(801, "later"))
    q.processAllAvailable()

    val rows = spark.table("toptok_t").collect()
    assert(rows.nonEmpty, "minute-0 window must have finalized")
    val top = rows.find(_.getTimestamp(0).getTime == m0).get
      .getSeq[org.apache.spark.sql.Row](1)
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // exact regime: alpha 4 (3 in batch 1 + 1 in batch 2), beta 4 (1 + 3),
    // gamma 1 — zero error, merged across batches; the 4-count tie breaks
    // token-asc (alpha first)
    assert(top == Seq(("alpha", 4L, 0L), ("beta", 4L, 0L), ("gamma", 1L, 0L)),
      s"got $top")
    q.stop()
  }

  test("streaming dedup collapses redelivered events within the watermark") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.DedupStream

    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val enc: org.apache.spark.sql.Encoder[(Long, Timestamp)] =
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.TIMESTAMP)

    val t0 = 1700000000000L
    def ev(id: Long, minutes: Long) = (id, new Timestamp(t0 + minutes * 60000))

    val input = MemoryStream[(Long, Timestamp)]
    val q = DedupStream.start(
      input.toDF().toDF("event_id", "ts"), queryName = "dedup_t",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))

    // id=1 delivered three times (same batch AND a later batch), id=2 once
    input.addData(ev(1, 0), ev(1, 0), ev(2, 1))
    q.processAllAvailable()
    input.addData(ev(1, 2), ev(3, 3)) // redelivery within the 10-min watermark
    q.processAllAvailable()

    val ids = spark.table("dedup_t").select("event_id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L),
      s"each event id must survive exactly once, got ${ids.mkString(",")}")
    q.stop()
  }

  test("streaming bloom decontam prunes statelessly and never false-negatives") {
    // the q77 bloom prune is a pure expression — no state store, no
    // watermark — so the SAME filter column works unchanged on a stream:
    // the decontam pattern for data arriving as a feed. One-sided error on
    // a stream means: every truly-contaminated doc is flagged (no false
    // negatives, asserted exactly); false positives are possible
    // pre-verify, so the streamed stage keeps the shingle for the
    // downstream exact check rather than deciding alone.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.functions.BloomExpressions

    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val enc: org.apache.spark.sql.Encoder[(Long, Long)] =
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong)

    val reference = (0L until 64L).map(_ * 7919L) // "eval shingles"
    val refDf = spark.createDataFrame(reference.map(Tuple1(_))).toDF("g")
    val bloom = refDf.stat.bloomFilter("g", reference.size.toLong, 0.01)

    val input = MemoryStream[(Long, Long)] // (doc_id, shingle hash)
    val q = input.toDF().toDF("doc_id", "g")
      .filter(BloomExpressions.mightContainLong(col("g"), bloom))
      .writeStream.format("memory").queryName("bloom_t").outputMode("append")
      .start()

    // docs 1,2 carry reference shingles; 3 carries only novel ones
    input.addData((1L, 7919L), (2L, 7919L * 5), (3L, 1L), (3L, 2L))
    q.processAllAvailable()
    input.addData((4L, 7919L * 63), (5L, 3L))
    q.processAllAvailable()

    val flagged = spark.table("bloom_t").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(Set(1L, 2L, 4L).subsetOf(flagged),
      s"contaminated docs must all be flagged (no false negatives), got $flagged")
    // at fpp=0.01 over 4 novel hashes, a false positive is possible but
    // each flagged doc must at least be explainable: doc 3/5 may appear
    // only via bloom false positives — bounded, not asserted
    q.stop()
  }

  test("streaming near-dup filter suppresses minhash-colliding later docs") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.NearDupStream

    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val enc: org.apache.spark.sql.Encoder[(Long, Timestamp, String)] =
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.TIMESTAMP,
        org.apache.spark.sql.Encoders.STRING)

    val t0 = 1700000000000L
    def doc(id: Long, minutes: Long, text: String) =
      (id, new Timestamp(t0 + minutes * 60000), text)
    val a = "the quick brown fox jumps over the lazy dog again and again"
    val b = "completely different content about distributed query engines"
    val c = "yet another unrelated document concerning parquet file layouts"

    val input = MemoryStream[(Long, Timestamp, String)]
    val q = NearDupStream.start(
      input.toDF().toDF("doc_id", "ts", "text"), queryName = "neardup_t",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))

    input.addData(doc(1, 0, a), doc(2, 1, b))
    q.processAllAvailable()
    // doc 3 = exact text of doc 1, arriving LATER within the watermark:
    // collides on every band, must be suppressed; doc 4 is novel
    input.addData(doc(3, 2, a), doc(4, 3, c))
    q.processAllAvailable()
    // push the watermark far past every window so the counts finalize
    input.addData(doc(99, 100000, "push one"))
    q.processAllAvailable()
    input.addData(doc(98, 100001, "push two"))
    q.processAllAvailable()

    val ids = spark.table("neardup_t").select("doc_id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 2L, 4L),
      s"near-dup doc 3 must be suppressed, novel docs kept; got ${ids.mkString(",")}")
    q.stop()
  }

  test("stream-stream range join pairs events within the window only") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.RangeJoinStream

    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val enc: org.apache.spark.sql.Encoder[(Long, Long, Timestamp)] =
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.TIMESTAMP)

    val t0 = 1700000000000L
    def at(minutes: Long) = new Timestamp(t0 + minutes * 60000)

    val errors = MemoryStream[(Long, Long, Timestamp)]
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val joined = RangeJoinStream.recentWithin(
      errors.toDF().toDF("user_id", "event_id", "ts"),
      clicks.toDF().toDF("user_id", "event_id", "ts"),
      key = "user_id", ts = "ts", windowSeconds = 3600)
    val q = joined
      .select(col("event_id"), col("b_event_id"))
      .writeStream.format("memory").queryName("rj_t").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      .start()

    // click 30 min before the error (in window), click 2h before (out),
    // click from another user (out), click AFTER the error (out)
    clicks.addData((1L, 100L, at(0)), (1L, 101L, at(90)), (2L, 102L, at(110)),
      (1L, 103L, at(125)))
    errors.addData((1L, 500L, at(120)))
    q.processAllAvailable()

    val pairs = spark.table("rj_t").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((500L, 101L)),
      s"only the in-window same-user click must join, got $pairs")
    q.stop()
  }

  test("streaming contamination guard: stream-static join flags train hits with exact counts") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.ContamGuardStream

    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val enc: org.apache.spark.sql.Encoder[(Long, Timestamp, String)] =
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.TIMESTAMP,
        org.apache.spark.sql.Encoders.STRING)
    import spark.implicits._

    // static train index via the SAME kernel the batch audit uses: doc 0
    // deals to train under splitOf (asserted in SplitContamSpec)
    val train = graft.queries.Training.trainWindowHashes(
      Seq((0L, "the quick brown fox jumps over the lazy dog"))
        .toDF("doc_id", "text"))

    val m0 = 1700000000000L - (1700000000000L % 3600000)
    def doc(id: Long, minutes: Long, text: String) =
      (id, new Timestamp(m0 + minutes * 60000), text)

    val input = MemoryStream[(Long, Timestamp, String)]
    val q = ContamGuardStream.start(
      input.toDF().toDF("doc_id", "ts", "text"), train, queryName = "guard_t",
      watermarkDelay = "10 minutes", windowLength = "1 minute",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))

    // doc 21 shares exactly one 5-gram window with the train doc (the
    // SplitContamSpec fixture); doc 22 is clean — the inner join drops it
    input.addData(
      doc(21L, 0, "prefix quick brown fox jumps over tail"),
      doc(22L, 0, "completely different words in this one here"))
    q.processAllAvailable()
    // advance the watermark past doc 21's window so append mode emits
    input.addData(doc(23L, 30, "jumps over the lazy dog and more trailing text"))
    q.processAllAvailable()
    input.addData(doc(24L, 31, "nothing shared here at all truly"))
    q.processAllAvailable()

    val flagged = spark.table("guard_t").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flagged.get(21L).contains(1L),
      s"doc 21 must flag with exactly 1 hit, got $flagged")
    assert(!flagged.contains(22L), s"clean doc must not emit, got $flagged")
    // doc 23 shares "jumps over the lazy dog" with train — flagged once
    // its window finalizes; not asserted (its window may still be open)
    q.stop()
  }

  test("streaming index dedup: verified corpus near-dups flag, novel docs never emit") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.IndexDedupStream

    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val enc: org.apache.spark.sql.Encoder[(Long, Timestamp, String)] =
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.TIMESTAMP,
        org.apache.spark.sql.Encoders.STRING)
    import spark.implicits._

    // corpus behind a REAL persisted band index (the q66 artifact)
    val ta = (0 until 32).map(i => s"c${i}w").mkString(" ")
    val tb = (0 until 32).map(i => s"z${i}q").mkString(" ")
    val corpus = Seq((10L, ta), (11L, tb)).toDF("doc_id", "text")
    val path = java.nio.file.Files
      .createTempDirectory("graft_stream_idx").toString + "/idx"
    graft.queries.DedupStore.persistBandIndex(corpus, path)

    val m0 = 1700000000000L - (1700000000000L % 3600000)
    def doc(id: Long, minutes: Long, text: String) =
      (id, new Timestamp(m0 + minutes * 60000), text)
    // doc 1: verbatim copy of corpus doc 10 (j = 1.0); doc 2: novel;
    // doc 3: one token of 32 mutated (j ≈ 0.82 ≥ 0.7 — a true near-dup)
    val mutated = (0 until 32).map(i => if (i == 16) "XXX" else s"c${i}w").mkString(" ")
    val novel = (0 until 32).map(i => s"n${i}x").mkString(" ")

    val input = MemoryStream[(Long, Timestamp, String)]
    val q = IndexDedupStream.start(
      spark, input.toDF().toDF("doc_id", "ts", "text"), path,
      queryName = "idx_dedup_t",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))

    input.addData(doc(1L, 0, ta), doc(2L, 0, novel), doc(3L, 1, mutated))
    q.processAllAvailable()
    // advance the watermark far past the windows so append mode emits
    input.addData(doc(98L, 30, novel))
    q.processAllAvailable()
    input.addData(doc(99L, 31, novel))
    q.processAllAvailable()

    val out = spark.table("idx_dedup_t").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out.get(1L).exists { case (n, j) => n == 1L && j == 1.0 },
      s"verbatim copy must flag with jaccard 1.0 against exactly doc 10: $out")
    assert(out.get(3L).exists { case (n, j) => n == 1L && j >= 0.7 && j < 1.0 },
      s"mutated near-dup must flag with 0.7 <= j < 1: $out")
    assert(!out.contains(2L), s"novel doc must never emit: $out")

    // stream == batch: the flags agree with incrementalMinhashPairs over
    // the same batch against the same index (crossings only — the guard's
    // contract excludes within-stream pairs)
    val batchPairs = graft.queries.DedupStore.incrementalMinhashPairs(
        spark, Seq((1L, ta), (2L, novel), (3L, mutated)).toDF("doc_id", "text"),
        path, threshold = 0.7)
      .filter(org.apache.spark.sql.functions.col("existing_id") >= 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(batchPairs.map(_._1).toSet === Set(1L, 3L),
      s"batch incremental pairs must agree with the stream flags: ${batchPairs.toSeq}")
    q.stop()

    // the EXACT tier over the same corpus: stateless fingerprint guard —
    // the verbatim copy resolves to its stored canonical immediately (no
    // watermark needed); the near-dup and novel docs pass it silently
    graft.queries.DedupStore.persistExactIndex(corpus, path)
    val input2 = MemoryStream[(Long, Timestamp, String)]
    val q2 = graft.streaming.IndexDedupStream.startExact(
      spark, input2.toDF().toDF("doc_id", "ts", "text"), path,
      queryName = "exact_guard_t",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    input2.addData(doc(1L, 0, ta), doc(2L, 0, novel), doc(3L, 1, mutated))
    q2.processAllAvailable()
    val exact = spark.table("exact_guard_t").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exact === Map(1L -> 10L),
      s"only the byte-identical repost resolves in the exact tier: $exact")
    q2.stop()
  }

  test("streaming quality gate: the q92 projection is stateless and stream==batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val enc: org.apache.spark.sql.Encoder[(Long, String)] =
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.STRING)
    import spark.implicits._

    val rows = graft.queries.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text").limit(20).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq

    val input = MemoryStream[(Long, String)]
    val q = graft.queries.TextAnalysis.qualityGate(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("gate_t").outputMode("append")
      .start()
    input.addData(rows.take(10): _*)
    q.processAllAvailable()
    input.addData(rows.drop(10): _*)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("gate_t").collect()
      .map(r => r.getLong(0) -> r.toSeq.toVector).toMap
    val batch = graft.queries.TextAnalysis
      .qualityGate(rows.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> r.toSeq.toVector).toMap
    assert(streamed.keySet == batch.keySet)
    streamed.foreach { case (id, row) =>
      assert(row == batch(id), s"doc $id: stream gate diverged from batch")
    }
  }

  test("streaming adaptive gate: batch-solved thresholds apply stream==batch; unknown source passes") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val enc: org.apache.spark.sql.Encoder[(Long, String, String)] =
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.STRING)
    import spark.implicits._

    val docs = graft.queries.Tables(spark, "/root/testdata/sf0.001", "documents")
    // the batch SOLVE: one threshold per source (q115's histogram rule),
    // MATERIALIZED to parquet and read back — the production handoff (the
    // gate consumes the solved artifact, not the live solve plan; see the
    // QualityGateStream doc for why a live plan is also a correctness
    // hazard here)
    val batchOut = graft.queries.Curation.adaptiveQualityFilter(docs, keepFraction = 0.7)
    val thrPath = java.nio.file.Files.createTempDirectory("graft-qgate-thr").toString
    batchOut.select("source", "thr").distinct()
      .write.mode("overwrite").parquet(thrPath)
    val thresholds = spark.read.parquet(thrPath)
    val expected = batchOut.collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getInt(4))).toMap

    val rows = docs.select("doc_id", "source", "text").limit(30).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq

    val input = MemoryStream[(Long, String, String)]
    val q = graft.streaming.QualityGateStream.start(
      input.toDF().toDF("doc_id", "source", "text"), thresholds,
      queryName = "adaptive_gate_t",
      // AvailableNow would terminate on the (empty) start-time snapshot
      // and ignore addData after start — the MemoryStream tests need a
      // live trigger (same as the contam-guard test)
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    input.addData(rows.take(15): _*)
    q.processAllAvailable()
    // a source the solve never saw: permissive default, thr null, keep=1
    input.addData(rows.drop(15): _*)
    input.addData((9999L, "brand_new_source", "some perfectly ordinary text here"))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("adaptive_gate_t").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getInt(4))).toMap
    rows.foreach { case (id, _, _) =>
      val (score, thr, keep) = expected(id)
      assert(streamed(id) == ((score, Some(thr), keep)),
        s"doc $id: stream gate ${streamed(id)} != batch ($score, $thr, $keep)")
    }
    assert(streamed(9999L)._2.isEmpty && streamed(9999L)._3 == 1,
      s"unknown source must pass with null thr, got ${streamed(9999L)}")
  }

  test("streaming shard ingest: batch 1 bootstraps, batch 2 appends, published shards stay stable") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val enc: org.apache.spark.sql.Encoder[(Long, String, String)] =
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.STRING)
    import spark.implicits._

    val rows = graft.queries.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "source", "text").limit(40).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val out = java.nio.file.Files.createTempDirectory("graft-shard-ingest").toString
    val epochDir = s"$out/epoch=1"

    val input = MemoryStream[(Long, String, String)]
    val q = graft.streaming.ShardIngestStream.start(
      input.toDF().toDF("doc_id", "source", "text"), out, queryName = "shard_ingest_t")

    input.addData(rows.take(25): _*)
    q.processAllAvailable()
    def snapshot(): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles.toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(epochDir)).filter(_.getName.endsWith(".parquet"))
        .map(f => f.getAbsolutePath -> f.length()).toMap
    }
    val afterB1 = snapshot()
    assert(afterB1.nonEmpty, "batch 1 must bootstrap the shard layout")
    val maxB1 = spark.read.parquet(epochDir)
      .agg(max(col("shard_id").cast("long"))).head.getLong(0)

    input.addData(rows.drop(25): _*)
    q.processAllAvailable()
    q.stop()

    // batch 1's files are untouched; batch 2's docs sit in new shards only
    val afterB2 = snapshot()
    afterB1.foreach { case (p, size) =>
      assert(afterB2.get(p).contains(size), s"published shard file changed: $p")
    }
    val all = spark.read.parquet(epochDir)
      .select(col("shard_id").cast("long"), col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val b1Ids = rows.take(25).map(_._1).toSet
    all.foreach { case (sid, doc) =>
      if (!b1Ids.contains(doc)) assert(sid > maxB1, s"batch-2 doc $doc in published shard $sid")
    }
    // nothing lost, nothing duplicated
    assert(all.map(_._2).sorted.toSeq == rows.map(_._1).sorted.toSeq)
  }

  test("streaming pack ingest: batch 1 bootstraps, batch 2 resumes the stream, published spans stay stable") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val enc: org.apache.spark.sql.Encoder[(Long, String, String)] =
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.STRING)
    import spark.implicits._

    val rows = graft.queries.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "source", "text").limit(40).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val (r1, r2) = rows.partition(_._1 % 7 != 0)
    def df(rs: Seq[(Long, String, String)]) =
      rs.toDF("doc_id", "source", "text")
    val store = java.nio.file.Files.createTempDirectory("graft-pack-ingest").toString

    val input = MemoryStream[(Long, String, String)]
    val q = graft.streaming.PackIngestStream.start(
      input.toDF().toDF("doc_id", "source", "text"), store,
      queryName = "pack_ingest_t")

    def spans(d: org.apache.spark.sql.DataFrame) = d
      .select("source", "pack_id", "doc_id", "tok_start", "tok_end", "crosses_boundary")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getInt(5))).sortBy(t => (t._1, t._2, t._3)).toSeq
    def files(): Map[String, Long] =
      new java.io.File(store).listFiles.toSeq
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getAbsolutePath -> f.length()).toMap

    input.addData(r1: _*)
    q.processAllAvailable()
    assert(spans(spark.read.parquet(store)) ==
      spans(graft.queries.Release.packManifest(df(r1))),
      "batch 1 must bootstrap to exactly its own manifest")
    val afterB1 = files()

    input.addData(r2: _*)
    q.processAllAvailable()
    q.stop()

    // published span files are untouched; the store equals the two-day
    // batch fold — stream == batch, q159's contract per micro-batch
    afterB1.foreach { case (p, size) =>
      assert(files().get(p).contains(size), s"published manifest file changed: $p")
    }
    assert(spans(spark.read.parquet(store)) ==
      spans(graft.queries.Release.packManifestAppend(
        graft.queries.Release.packManifest(df(r1)), df(r2))),
      "streamed store must equal the batch continuation fold")
  }

  test("streaming pack ingest refuses tombstoned docs at the front door") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val enc: org.apache.spark.sql.Encoder[(Long, String, String)] =
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.STRING)
    import spark.implicits._

    val rows = graft.queries.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "source", "text").limit(40).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val (tomb, keep) = rows.partition(_._1 % 7 == 0)
    def df(rs: Seq[(Long, String, String)]) = rs.toDF("doc_id", "source", "text")
    val root = java.nio.file.Files.createTempDirectory("graft-pack-tomb").toString
    val store = s"$root/store"
    val ledger = s"$root/tombs"
    graft.pipeline.Forget.appendTombstones(df(tomb).select("doc_id"), ledger)

    val input = MemoryStream[(Long, String, String)]
    val q = graft.streaming.PackIngestStream.start(
      input.toDF().toDF("doc_id", "source", "text"), store,
      queryName = "pack_ingest_tomb_t", tombstonePath = Some(ledger))
    input.addData(rows: _*) // mixed: forgotten + fresh in one batch
    q.processAllAvailable()
    // a FULLY-tombstoned batch must be a committed no-op, not a bootstrap
    input.addData(tomb: _*)
    q.processAllAvailable()
    q.stop()

    def spans(d: org.apache.spark.sql.DataFrame) = d
      .select("source", "pack_id", "doc_id", "tok_start", "tok_end", "crosses_boundary")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getInt(5))).sortBy(t => (t._1, t._2, t._3)).toSeq
    assert(spans(spark.read.parquet(store)) ==
      spans(graft.queries.Release.packManifest(df(keep))),
      "the guarded store must pack exactly the non-tombstoned rows")
  }

  test("streaming boundary-pack ingest: buckets resume across batches, stream==batch fold") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val enc: org.apache.spark.sql.Encoder[(Long, String, String)] =
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.STRING)
    import spark.implicits._

    val rows = graft.queries.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "source", "text").limit(40).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val (r1, r2) = rows.partition(_._1 % 7 != 0)
    def df(rs: Seq[(Long, String, String)]) = rs.toDF("doc_id", "source", "text")
    val store = java.nio.file.Files
      .createTempDirectory("graft-bpack-ingest").toString

    val input = MemoryStream[(Long, String, String)]
    val q = graft.streaming.BoundaryPackIngestStream.start(
      input.toDF().toDF("doc_id", "source", "text"), store,
      queryName = "bpack_ingest_t")

    def rowsOf(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.toSeq).toSet

    input.addData(r1: _*)
    q.processAllAvailable()
    assert(rowsOf(spark.read.parquet(store)) ==
      rowsOf(graft.queries.Release.boundaryPack(df(r1))),
      "batch 1 must bootstrap to exactly its own manifest")
    val filesB1 = new java.io.File(store).listFiles.toSeq
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getAbsolutePath -> f.length()).toMap

    input.addData(r2: _*)
    q.processAllAvailable()
    q.stop()

    filesB1.foreach { case (p, size) =>
      val f = new java.io.File(p)
      assert(f.exists && f.length() == size, s"published file changed: $p")
    }
    assert(rowsOf(spark.read.parquet(store)) ==
      rowsOf(graft.queries.Release.boundaryPackAppend(
        graft.queries.Release.boundaryPack(df(r1)), df(r2))),
      "streamed store must equal the batch continuation fold")
  }

  test("streaming release ingest: live view == batch rebuild per micro-batch, published rows immutable, demotions tombstone at their address") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val enc: org.apache.spark.sql.Encoder[(Long, String, String)] =
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.STRING)
    import spark.implicits._

    // planted corpus with full control of the pair graph: unique-word
    // docs (no cross-doc shingles) plus one engineered near-dup family —
    // doc 100 (25 words) is beaten in batch 2 by doc 200 (26 words,
    // j = 24/25), and batch 3's doc 300 (doc 100's text verbatim) joins
    // the family but cannot win
    def uniq(d: Long, n: Int) =
      (d, s"s${d % 2}", (0 until n).map(i => s"u${d}_$i").mkString(" "))
    val fam = (0 until 25).map(i => s"f_$i")
    val b1 = Seq(uniq(1L, 12), uniq(2L, 30), uniq(3L, 18),
      (100L, "s0", fam.mkString(" ")))
    val b2 = Seq(uniq(4L, 15), uniq(5L, 40),
      (200L, "s0", (fam :+ "f_25").mkString(" ")))
    val b3 = Seq(uniq(6L, 22), (300L, "s1", fam.mkString(" ")))
    def cdf(batches: Seq[(Long, String, String)]*) =
      batches.flatten.toDF("doc_id", "source", "text")
        .withColumn("n_chars", length(col("text")).cast("long"))

    val indexDir = java.nio.file.Files
      .createTempDirectory("graft-release-index").toString + "/idx"
    val releaseDir = java.nio.file.Files
      .createTempDirectory("graft-release-rel").toString + "/rel"
    val input = MemoryStream[(Long, String, String)]
    val q = graft.streaming.ReleaseIngestStream.start(
      input.toDF().toDF("doc_id", "source", "text"), indexDir, releaseDir,
      queryName = "release_ingest_t")

    def rel() = spark.read.parquet(releaseDir)
    def liveIds() = {
      val r = rel()
      r.filter(col("status") === "published")
        .join(r.filter(col("status") === "revoked").select(col("doc_id")),
          Seq("doc_id"), "left_anti")
        .select("doc_id").collect().map(_.getLong(0)).toSet
    }
    def expectIds(batches: Seq[(Long, String, String)]*) =
      graft.queries.Dedup.dedupManifest(cdf(batches: _*))
        .filter(col("keep") === 1)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    def files() = new java.io.File(releaseDir).listFiles.toSeq
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getAbsolutePath -> f.length()).toMap

    input.addData(b1: _*)
    q.processAllAvailable()
    assert(liveIds() == expectIds(b1),
      "bootstrap live view must equal the batch-1 dedup keepers")
    val filesB1 = files()

    input.addData(b2: _*)
    q.processAllAvailable()
    assert(liveIds() == expectIds(b1, b2),
      "after batch 2 the live view must equal the cumulative rebuild")
    assert(!liveIds().contains(100L) && liveIds().contains(200L),
      "doc 200 must demote doc 100")
    // the demotion is a tombstone AT the published address, not a rewrite
    val pubRows = rel().filter(col("status") === "published")
      .select("doc_id", "pack_id", "shard_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val revRows = rel().filter(col("status") === "revoked")
      .select("doc_id", "pack_id", "shard_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(revRows.nonEmpty && revRows.subsetOf(pubRows),
      "every tombstone must reference a published address")
    filesB1.foreach { case (p, size) =>
      val f = new java.io.File(p)
      assert(f.exists && f.length() == size, s"published file changed: $p")
    }
    val filesB2 = files()

    input.addData(b3: _*)
    q.processAllAvailable()
    q.stop()
    assert(liveIds() == expectIds(b1, b2, b3),
      "after batch 3 the live view must equal the cumulative rebuild")
    assert(!liveIds().contains(300L),
      "doc 300 joins the family but must not be published")
    filesB2.foreach { case (p, size) =>
      val f = new java.io.File(p)
      assert(f.exists && f.length() == size, s"published file changed: $p")
    }

    // epoch-boundary compaction: value-invisible on the live view, the
    // tombstones and the per-micro-batch files fold away
    val liveBefore = rel().filter(col("status") === "published")
      .join(rel().filter(col("status") === "revoked").select(col("doc_id")),
        Seq("doc_id"), "left_anti")
      .select("source", "doc_id", "n_toks", "pack_id", "shard_id", "status")
      .collect().map(_.toSeq).toSet
    val nFilesBefore = files().size
    graft.streaming.ReleaseIngestStream.compactRelease(spark, releaseDir)
    assert(rel().filter(col("status") === "revoked").isEmpty,
      "compaction must fold every tombstone away")
    assert(rel().collect().map(_.toSeq).toSet == liveBefore,
      "compaction must be value-invisible on the live view")
    assert(files().size <= nFilesBefore,
      "compaction must not grow the file count")
  }

  test("streaming takedown: each micro-batch shadows exactly the live requests, stream==batch, published files immutable") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    // twin stores absorbed identically: A takes the STREAMED takedowns,
    // B the batch takedownIngest — stream ≡ batch is row-set identity
    def uniq(d: Long, n: Int) =
      (d, s"s${d % 2}", (0 until n).map(i => s"u${d}_$i").mkString(" "))
    val fam = (0 until 25).map(i => s"f_$i")
    val b1 = Seq(uniq(1L, 12), uniq(2L, 30), (100L, "s0", fam.mkString(" ")))
    val b2 = Seq(uniq(4L, 15), (200L, "s0", (fam :+ "f_25").mkString(" ")))
    def bdf(batch: Seq[(Long, String, String)]) =
      batch.toDF("doc_id", "source", "text")
    val dirs = Seq("a", "b").map { t =>
      val idx = java.nio.file.Files
        .createTempDirectory(s"graft-td-idx-$t").toString + "/idx"
      val rel = java.nio.file.Files
        .createTempDirectory(s"graft-td-rel-$t").toString + "/rel"
      graft.streaming.ReleaseIngestStream.ingest(bdf(b1), idx, rel)
      graft.streaming.ReleaseIngestStream.ingest(bdf(b2), idx, rel)
      rel
    }
    val (relA, relB) = (dirs.head, dirs.last)
    def rows(dir: String) = spark.read.parquet(dir)
      .collect().map(_.toSeq).toSet
    def files(dir: String) = new java.io.File(dir).listFiles.toSeq
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getAbsolutePath -> f.length()).toMap
    assert(rows(relA) == rows(relB), "twin stores must absorb identically")

    val input = MemoryStream[Long]
    val tombs = java.nio.file.Files
      .createTempDirectory("graft-td-tombs").toString + "/ledger"
    val q = graft.streaming.TakedownStream.start(
      input.toDF().toDF("doc_id"), relA, queryName = "takedown_t",
      tombstonePath = Some(tombs))

    // micro-batch 1: doc 2 is live (flips), doc 100 was demoted by 200
    // (shielded — no tombstone may appear for it)
    val filesB1 = files(relA)
    input.addData(2L, 100L)
    q.processAllAvailable()
    graft.streaming.ReleaseIngestStream.takedownIngest(
      spark, Seq(2L, 100L).toDF("doc_id"), relB)
    assert(rows(relA) == rows(relB), "stream must equal batch after batch 1")
    val tds1 = spark.read.parquet(relA)
      .filter(col("status") === "taken_down")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(tds1 == Set(2L),
      "only the live request flips; the demoted one is shielded")
    filesB1.foreach { case (p, size) =>
      val f = new java.io.File(p)
      assert(f.exists && f.length() == size, s"published file changed: $p")
    }

    // micro-batch 2: the family keeper itself is taken down
    input.addData(200L)
    q.processAllAvailable()
    q.stop()
    graft.streaming.ReleaseIngestStream.takedownIngest(
      spark, Seq(200L).toDF("doc_id"), relB)
    assert(rows(relA) == rows(relB), "stream must equal batch after batch 2")

    // the folded view verifies leak-free over everything requested so far
    val folded = graft.streaming.ReleaseIngestStream
      .foldedRelease(spark.read.parquet(relA))
    val v = graft.queries.Release.takedownVerify(
      folded, Seq(2L, 100L, 200L).toDF("doc_id")).collect()
    assert(v.map(_.getAs[Long]("n_live_leaks")).sum == 0L)
    assert(v.map(_.getAs[Long]("n_taken_down")).sum == 2L)
    assert(v.map(_.getAs[Long]("n_shielded")).sum == 1L)

    // every streamed request also landed in the tombstone ledger, so the
    // same content is refused at any future ingest front door
    val ledgerIds = spark.read.parquet(tombs)
      .collect().map(_.getLong(0)).toSet
    assert(ledgerIds == Set(2L, 100L, 200L),
      s"each micro-batch must tombstone its requests: $ledgerIds")
    val reingest = graft.pipeline.Forget.filterForgotten(
      spark, bdf(b1).unionByName(bdf(b2)), tombs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(reingest == Set(1L, 4L),
      "a re-ingest of the corpus must keep exactly the never-requested docs")
  }

  test("streaming pinned-centroid assignment: zero-join scoring, stream==batch q96 ranks") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val emb = graft.queries.Tables(spark, dir, "embeddings")
    val model = graft.queries.Similarity.kmeansFit(emb, k = 4, updateRounds = 2)
    assert(model.length == 4 && model.forall(_._2.length == 64))

    // batch reference under the SAME pinned model
    val batchOut = graft.queries.Similarity.assignPinned(emb, model)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the pinned projection must agree with the registered q96 assignment
    // (same centroids, same (dist, cid) ordering)
    val q96 = SparkEntry.queries("q96_kmeans")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(batchOut == q96, "pinned scoring diverged from the in-plan q96 assignment")

    val rows = emb.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    import spark.implicits._

    val input = MemoryStream[(Long, Array[Float])]
    val q = graft.queries.Similarity
      .assignPinned(input.toDF().toDF("vec_id", "embedding"), model)
      .writeStream.format("memory").queryName("assign_t").outputMode("append")
      .start()
    input.addData(rows.take(25).toSeq: _*)
    q.processAllAvailable()
    input.addData(rows.drop(25).toSeq: _*)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("assign_t").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batchOut, "streamed assignment diverged from batch")
  }

  test("streaming drift monitor: each micro-batch gauge equals the batch gauge over the same rows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val docs = graft.queries.Tables(spark, "/root/testdata/sf0.001", "documents")
    // the frozen day-N reference: materialized parquet, like production
    val storedPath = java.nio.file.Files.createTempDirectory("graft-drift-hist").toString
    graft.queries.Curation.scoreHistogram(
        docs.filter(pmod(col("doc_id"), lit(5)) =!= 0))
      .write.mode("overwrite").parquet(storedPath)
    val stored = spark.read.parquet(storedPath)

    val batchRows = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val (b1, b2) = batchRows.splitAt(batchRows.length / 2)

    val gauges = scala.collection.mutable.ArrayBuffer.empty[Array[Seq[Any]]]
    val input = MemoryStream[(String, String)]
    val q = graft.streaming.DriftMonitorStream.start(
      input.toDF().toDF("source", "text"), stored,
      onGauge = (_, df) =>
        gauges.synchronized { gauges += df.collect().map(_.toSeq); () })
    input.addData(b1: _*)
    q.processAllAvailable()
    input.addData(b2: _*)
    q.processAllAvailable()
    q.stop()

    assert(gauges.length == 2, s"expected one gauge per micro-batch, got ${gauges.length}")
    Seq(b1, b2).zip(gauges).zipWithIndex.foreach { case ((rows, gauge), i) =>
      val batchGauge = graft.queries.Curation
        .driftMonitor(stored, rows.toDF("source", "text"))
        .collect().map(_.toSeq)
      assert(gauge.toSeq == batchGauge.toSeq,
        s"micro-batch $i: online gauge diverged from the batch gauge")
    }
    // a micro-batch is a fraction of a day: sources present in the store
    // but absent from this batch must report `stale`, present ones a
    // real status — no silent row drops
    val statuses = gauges.head.map(r => r(4).asInstanceOf[String]).toSet
    assert(statuses.subsetOf(Set("new", "stale", "drift", "ok")))
  }

  test("streaming novelty monitor: per-micro-batch gauge equals the hashed batch gauge") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val docs = graft.queries.Tables(spark, "/root/testdata/sf0.001", "documents")
    val storedPath = java.nio.file.Files.createTempDirectory("graft-novelty-store").toString
    graft.queries.Curation.hashedWindowStore(
        docs.filter(pmod(col("doc_id"), lit(5)) =!= 0))
      .write.mode("overwrite").parquet(storedPath)
    val stored = spark.read.parquet(storedPath)

    val batchRows = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val (b1, b2) = batchRows.splitAt(batchRows.length / 2)

    val gauges = scala.collection.mutable.ArrayBuffer.empty[Array[Seq[Any]]]
    val input = MemoryStream[(String, String)]
    val q = graft.streaming.NoveltyMonitorStream.start(
      input.toDF().toDF("source", "text"), stored,
      onGauge = (_, df) =>
        gauges.synchronized { gauges += df.collect().map(_.toSeq); () })
    input.addData(b1: _*)
    q.processAllAvailable()
    input.addData(b2: _*)
    q.processAllAvailable()
    q.stop()

    assert(gauges.length == 2)
    Seq(b1, b2).zip(gauges).zipWithIndex.foreach { case ((rows, gauge), i) =>
      val batchGauge = graft.queries.Curation
        .hashedContentNovelty(stored, rows.toDF("source", "text"))
        .collect().map(_.toSeq)
      assert(gauge.toSeq == batchGauge.toSeq,
        s"micro-batch $i: online novelty diverged from the batch gauge")
    }
  }

  test("streaming blowup monitor: per-batch df-shape gauge equals q178 over the same rows; boilerplate spikes in its own batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    // batch 1: clean unique-word docs. batch 2: a template-heavy segment —
    // 6 docs sharing a 5-word block (the q178 planted signature). The
    // monitor must show ~zero raw mass for batch 1 and the spike INSIDE
    // batch 2, and each gauge must equal the batch q178 over the same rows.
    val clean = (1 to 6).map(i =>
      (i.toLong, (1 to 25).map(j => s"c${i}_$j").mkString(" ")))
    val shared = (1 to 5).map(i => s"s$i")
    val boiler = (11 to 16).map(i =>
      (i.toLong, (shared ++ (1 to 20).map(j => s"u${i}_$j")).mkString(" ")))

    val gauges = scala.collection.mutable.ArrayBuffer.empty[Array[Seq[Any]]]
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.BlowupMonitorStream.start(
      input.toDF().toDF("doc_id", "text"),
      onGauge = (_, df) =>
        gauges.synchronized { gauges += df.collect().map(_.toSeq); () })
    input.addData(clean: _*)
    q.processAllAvailable()
    input.addData(boiler: _*)
    q.processAllAvailable()
    q.stop()

    assert(gauges.length == 2)
    Seq(clean, boiler).zip(gauges).zipWithIndex.foreach { case ((rows, gauge), i) =>
      val batchGauge = graft.queries.Dedup
        .pairBlowupAudit(rows.toDF("doc_id", "text"))
        .collect().map(_.toSeq)
      assert(gauge.toSeq == batchGauge.toSeq,
        s"micro-batch $i: online blowup gauge diverged from q178")
    }
    def rawOf(g: Array[Seq[Any]]) =
      g.head(4).asInstanceOf[Long] // n_raw_pairs column position
    assert(rawOf(gauges(0)) == 0L, "clean batch must carry zero raw mass")
    assert(rawOf(gauges(1)) == 45L,
      "the template segment must spike inside its own micro-batch")
  }
}
