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

  test("binary payload plumbing: decode stub is deterministic and partition-local") {
    val docs = Seq((1L, "hello world"), (2L, "")).toDF("doc_id", "text")
    val meta = Multimodal.decodeMeta(Multimodal.withPayload(docs))
      .collect().sortBy(_.doc_id)
    assert(meta(0).byte_len == 11L)
    assert(meta(0).width >= 16 && meta(0).height >= 16)
    assert(meta(1).byte_len == 0L)
    // determinism
    val again = Multimodal.decodeMeta(Multimodal.withPayload(docs)).collect().sortBy(_.doc_id)
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
