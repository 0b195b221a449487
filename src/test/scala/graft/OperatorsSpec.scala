package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.operators.AsOfJoin
import graft.queries.Dedup

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("lastPriorEvent picks the latest strictly-prior match per key") {
    val events = Seq(
      (1L, ts(10), 100L, "click"),
      (1L, ts(20), 101L, "click"),
      (1L, ts(30), 102L, "purchase"), // → 101
      (1L, ts(30), 103L, "click"),    // same ts as 102 but later event_id
      (1L, ts(40), 104L, "purchase"), // → 103
      (2L, ts(5), 200L, "purchase"),  // no prior click → null
      (2L, ts(6), 201L, "view")       // filtered out
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = AsOfJoin.lastPriorEvent(events, "click", "purchase")
      .orderBy("event_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(102L, 104L, 200L))
    assert(out(0).getLong(2) == 101L)
    assert(out(1).getLong(2) == 103L)
    assert(out(2).isNullAt(2))
  }

  test("generic asOf joins value from build side") {
    val probe = Seq((1L, ts(30), 1L), (1L, ts(5), 2L)).toDF("k", "t", "pid")
    val build = Seq((1L, ts(10), 10L, 7.5), (1L, ts(20), 11L, 9.5)).toDF("k", "t", "pid", "v")
    val out = AsOfJoin.asOf(probe, build, "k", "t", "pid", "v")
      .orderBy("pid").collect()
    assert(out(0).getDouble(out(0).fieldIndex("asof_v")) == 9.5)
    assert(out(1).isNullAt(out(1).fieldIndex("asof_v")))
  }

  test("generic asOf excludes a build row tied EXACTLY on (time, tiebreak)") {
    // documented semantics are strictly-before: an exact (t, pid) tie on the
    // build side must NOT match — only the genuinely earlier row does
    val probe = Seq((1L, ts(20), 10L)).toDF("k", "t", "pid")
    val build = Seq((1L, ts(10), 5L, 1.0), (1L, ts(20), 10L, 2.0)).toDF("k", "t", "pid", "v")
    val out = AsOfJoin.asOf(probe, build, "k", "t", "pid", "v").collect()
    assert(out.head.getDouble(out.head.fieldIndex("asof_v")) == 1.0,
      "exactly-tied build row leaked into the strictly-before frame")
  }
}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("minhashPairs finds planted near-duplicates and skips unrelated docs") {
    val base = "the quick brown fox jumps over the lazy dog again and again every single day"
    val docs = Seq(
      (1L, base),
      (2L, base + " tonight"),                                  // near-dup of 1
      (3L, "completely different content about databases and columnar execution engines"),
      (4L, "another unrelated document discussing gardening tulips and watering cans"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(docs, threshold = 0.5).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    assert(pairs.head.getDouble(2) > 0.5)
  }

  test("simhashPairs blocks on 16-bit bands and verifies hamming") {
    val base = "spark is a unified analytics engine for large scale data processing with apis"
    val docs = Seq(
      (1L, base),
      (2L, base + " everywhere"),
      (3L, "orthogonal text on birds migration patterns wings feathers and seasonal travel routes"))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(docs, maxHamming = 12).collect()
    val ids = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ids.contains((1L, 2L)))
    assert(!ids.contains((1L, 3L)) && !ids.contains((2L, 3L)))
  }
}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("binary payload plumbing: decode is deterministic and partition-local") {
    // text payloads take the deterministic-fake branch of the REAL decode
    // path (no decoder claims the bytes) — same plumbing, no stub API
    val docs = Seq((1L, "hello world"), (2L, "")).toDF("doc_id", "text")
    val meta = Multimodal.decodeMetaReal(Multimodal.withPayload(docs))
      .collect().sortBy(_.doc_id)
    assert(meta(0).byte_len == 11L)
    assert(meta(0).width >= 16 && meta(0).height >= 16)
    assert(meta(1).byte_len == 0L)
    // determinism
    val again = Multimodal.decodeMetaReal(Multimodal.withPayload(docs)).collect().sortBy(_.doc_id)
    assert(meta(0).checksum == again(0).checksum)
  }

  test("frame sampling explodes payload rows without shuffling") {
    val docs = Seq((1L, "x" * 200)).toDF("doc_id", "text")
    val frames = Multimodal.sampleFrames(Multimodal.withPayload(docs), everyN = 64)
    assert(frames.count() == 4) // offsets 0,64,128,192
  }

  test("real PNG bytes decode via javax.imageio; non-image bytes fall back to stub") {
    // a genuine 13x7 PNG produced by the JDK's own encoder
    val img = new java.awt.image.BufferedImage(13, 7, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(3, 2, 0xff8800)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray

    val direct = Multimodal.decode(7L, png)
    assert(direct.format == "image/png" && direct.width == 13 && direct.height == 7)
    assert(Multimodal.decode(8L, "just text".getBytes("UTF-8")).format.startsWith("fake/"))

    // and through the distributed partition-local path
    val media = Seq((7L, png), (8L, "just text".getBytes("UTF-8"))).toDF("doc_id", "payload")
    val out = Multimodal.decodeMetaReal(media).collect().sortBy(_.doc_id)
    assert(out(0).format == "image/png" && out(0).width == 13 && out(0).height == 7)
    assert(out(1).format.startsWith("fake/"))
  }

  test("WAV header parse: exact sample rate, channels, bits, duration from a synthesized header") {
    // 16 kHz stereo 16-bit, 1600 frames => 100 ms; byteRate = 16000*4
    val wav = Multimodal.synthWav(sampleRate = 16000, channels = 2, bitsPerSample = 16, frames = 1600)
    assert(wav.length == 44 + 1600 * 4)
    val m = Multimodal.decode(3L, wav)
    assert(m.format == "audio/wav")
    assert(m.sample_rate == 16000 && m.channels == 2 && m.bits == 16)
    assert(m.duration_ms == 100L, s"1600 frames at 16 kHz must be 100 ms, got ${m.duration_ms}")
    assert(m.width == 0 && m.height == 0)
    // 8 kHz mono 8-bit, 4000 frames => 500 ms
    val m2 = Multimodal.decode(4L,
      Multimodal.synthWav(sampleRate = 8000, channels = 1, bitsPerSample = 8, frames = 4000))
    assert(m2.sample_rate == 8000 && m2.channels == 1 && m2.bits == 8 && m2.duration_ms == 500L)
    // truncated header and bogus chunk sizes fall back to the stub, never throw
    assert(Multimodal.decode(5L, wav.take(20)).format.startsWith("fake/"))
    val corrupt = wav.clone()
    corrupt(16) = 0xff.toByte; corrupt(17) = 0xff.toByte // fmt chunk size -> garbage
    corrupt(18) = 0xff.toByte; corrupt(19) = 0x7f.toByte
    assert(Multimodal.decode(6L, corrupt).format.startsWith("fake/"))
    // a data chunk DECLARING more bytes than the payload holds is corruption,
    // not an hours-long recording: must stub, not report the inflated length
    val overrun = wav.clone()
    overrun(40) = 0xff.toByte; overrun(41) = 0xff.toByte // data size -> huge
    overrun(42) = 0xff.toByte; overrun(43) = 0x0f.toByte
    assert(Multimodal.decode(9L, overrun).format.startsWith("fake/"))
  }

  test("MP4 mvhd parse: exact duration from a synthesized moov box") {
    // timescale 600, duration 1500 ticks => 2500 ms
    val mp4 = Multimodal.synthMp4(timescale = 600, duration = 1500L)
    val m = Multimodal.decode(7L, mp4)
    assert(m.format == "video/mp4")
    assert(m.duration_ms == 2500L, s"1500/600 s must be 2500 ms, got ${m.duration_ms}")
    assert(m.sample_rate == 0 && m.width == 0)
    // ftyp without a moov box falls back to the stub
    assert(Multimodal.decode(8L, mp4.take(16)).format.startsWith("fake/"))
  }

  test("withPayload plants decodable wav/mp4 rows on the doc_id-keyed slice (q45 path)") {
    val docs = Seq((3L, "text a"), (7L, "text b"), (13L, "text c"), (21L, "text d"))
      .toDF("doc_id", "text")
    val out = Multimodal.decodeMetaReal(Multimodal.withPayload(docs))
      .collect().map(m => m.doc_id -> m).toMap
    assert(out(3L).format == "audio/wav" && out(13L).format == "audio/wav")
    // id-derived parameters: doc 3 -> 8000*(1+3%3)=8000 Hz, 1+3%2=2 ch; doc 13 -> 16000 Hz, 2 ch
    assert(out(3L).sample_rate == 8000 && out(3L).channels == 2 && out(3L).bits == 16)
    assert(out(13L).sample_rate == 16000 && out(13L).channels == 2)
    assert(out(3L).duration_ms > 0 && out(13L).duration_ms > 0)
    assert(out(7L).format == "video/mp4" && out(7L).duration_ms == (600L + 7) * 1000 / 600)
    assert(out(21L).format.startsWith("fake/"), "non-planted rows keep text payloads")
  }

  test("resize stage rescales real images and passes non-images through") {
    val img = new java.awt.image.BufferedImage(64, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 32).foreach(x => img.setRGB(x, 0, 0xffffff)) // half-bright top row
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray

    val resized = Multimodal.resizeImage(png, 16, 8).get
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(resized))
    assert(back.getWidth == 16 && back.getHeight == 8)
    assert(Multimodal.resizeImage("text".getBytes, 16, 8).isEmpty)

    val media = Seq((1L, png), (2L, "plain".getBytes("UTF-8"))).toDF("doc_id", "payload")
    val staged = Multimodal.resizeStage(media, 16, 8).collect()
      .map(r => r.getLong(0) -> ((r.getAs[Array[Byte]](1), r.getBoolean(2)))).toMap
    val dims = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(staged(1L)._1))
    assert(dims.getWidth == 16 && dims.getHeight == 8)
    assert(staged(1L)._2, "image row must be flagged resized")
    assert(staged(2L)._1.sameElements("plain".getBytes("UTF-8")), "non-image passes through")
    assert(!staged(2L)._2, "pass-through row must be flagged unresized")
  }

  test("grayscale histogram features: mass in the right bins, none for non-images") {
    val img = new java.awt.image.BufferedImage(10, 10, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 10).foreach(y => (0 until 10).foreach(x =>
      img.setRGB(x, y, if (y < 5) 0x000000 else 0xffffff)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val hist = Multimodal.grayHistogram(bos.toByteArray).get
    assert(hist.length == 16 && hist.sum == 100)
    assert(hist(0) == 50 && hist(15) == 50, s"bimodal image → edge bins: ${hist.mkString(",")}")
    assert(Multimodal.grayHistogram("nope".getBytes).isEmpty)
  }
}

class RegistrySpec extends SparkSpec {

  test("entry returns rows on sf0.001 (driver smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key exists in queries and every query has a doc") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
    assert(SparkEntry.registry.values.forall(_.doc.nonEmpty))
  }

  test("spot-check: q05 grouped agg shape at sf0.001") {
    val df = SparkEntry.queries("q05_agg_pricing")(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.length == 6)
    assert(df.columns.toSet.contains("sum_disc_price"))
  }

  test("spot-check: as-of join returns purchases with nullable prior click at sf0.001") {
    val df = SparkEntry.queries("q26_asof_join")(spark, "/root/testdata/sf0.001")
    assert(df.count() > 0)
  }

  test("events scan works when executed from a session WITHOUT the nanos flag") {
    // Tables.events scopes nanosAsLong to a cloned session; a plan that
    // joins events from the main session must still read TIMESTAMP(NANOS)
    val events = graft.queries.Tables(spark, "/root/testdata/sf0.001", "events")
    import spark.implicits._
    val users = Seq(events.select("user_id").head.getLong(0)).toDF("user_id")
    val joined = users.join(events, "user_id") // left side owns the main session
    assert(joined.count() > 0)
    assert(spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").forall(_ == "false"),
      "the caller session's conf must stay untouched")
  }
}
