package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Perceptual image dedup: dHash64 must connect the re-encodings a
  * byte-level checksum cannot (format re-encode, rescale, brightness
  * shift) and must NOT connect unrelated patterns.
  */
class DHashSpec extends SparkSpec {
  import spark.implicits._

  test("dHash is invariant to re-encode/rescale/brightness; unrelated images are far") {
    val base = Multimodal.synthImage(7L)
    val rescaled = Multimodal.resizeImage(base, 48, 48).get
    val brighter = Multimodal.synthImage(7L, brightness = 14)
    val unrelated = Multimodal.synthImage(8L)
    val hBase = Multimodal.dHash64(base).get
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // re-encoded duplicates: the planted-fixture contract the q70 fixture
    // relies on — small hamming despite no shared bytes
    assert(ham(hBase, Multimodal.dHash64(rescaled).get) <= 8,
      "48x48 PNG re-encode must stay within the q70 hamming budget")
    assert(ham(hBase, Multimodal.dHash64(brighter).get) <= 8,
      "uniform brightness shift preserves gradient signs")
    // unrelated pattern: ~32 expected; anything above the verify budget
    // proves the control rows cannot leak into the dup set
    assert(ham(hBase, Multimodal.dHash64(unrelated).get) > 8,
      "structurally unrelated images must not collide")
    // non-images produce no hash (pipeline stays total on arbitrary bytes)
    assert(Multimodal.dHash64("not an image".getBytes).isEmpty)
  }

  test("q70 finds exactly the planted re-encoding families on real doc_ids") {
    // imagePayloads plants: family f = {4f+0 original, 4f+1 rescale,
    // 4f+2 brightness} mutual near-dups; 4f+3 a doc-unique control.
    // Recall must be total (every within-family pair found) and no pair
    // may involve a control or cross families.
    val docs = graft.queries.Tables(spark, "/root/testdata/sf0.001", "documents")
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    val pairs = Multimodal
      .dhashPairs(Multimodal.imagePayloads(docs), maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (for {
      id <- ids; other <- ids
      if id < other && id / 4 == other / 4 && id % 4 != 3 && other % 4 != 3
    } yield (id, other)).toSet
    assert(pairs == expected,
      s"missing=${(expected -- pairs).take(5)} spurious=${(pairs -- expected).take(5)}")
  }
}
