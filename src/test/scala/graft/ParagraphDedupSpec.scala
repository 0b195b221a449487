package graft

import org.apache.spark.sql.functions._

import graft.queries.{Dedup, Tables}

/** q107's value-level contract on planted fixtures: a paragraph duplicated
  * across docs survives ONLY at its first (min doc, min chunk) occurrence,
  * unique paragraphs all survive, reassembly preserves chunk order, and
  * the chunk-key encoding's capacity bound holds on the real corpus.
  */
class ParagraphDedupSpec extends SparkSpec {

  // 32 distinct tokens = exactly one full chunk at window=32
  private def para(seed: Int): String =
    (0 until 32).map(i => s"w${seed}x$i").mkString(" ")

  test("planted cross-doc duplicate paragraph: only the first occurrence survives") {
    import spark.implicits._
    // doc 0: [shared, uniqueA]; doc 1: [uniqueB, shared]; doc 2: [uniqueC]
    val shared = para(99)
    val docs = Seq(
      (0L, shared + " " + para(1)),
      (1L, para(2) + " " + shared),
      (2L, para(3))).toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap

    assert(out(0L) === ((2L, 0L, shared + " " + para(1))), "doc 0 keeps both paragraphs")
    assert(out(1L) === ((2L, 1L, para(2))), "doc 1 loses the shared paragraph, keeps its own")
    assert(out(2L) === ((1L, 0L, para(3))), "unique doc untouched")
  }

  test("within-doc repeated paragraph also dedups to its first occurrence") {
    import spark.implicits._
    val p = para(7)
    val docs = Seq((5L, p + " " + p + " " + para(8))).toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(docs).collect()(0)
    assert(out.getLong(1) === 3L)
    assert(out.getLong(2) === 1L)
    assert(out.getString(3) === p + " " + para(8))
  }

  test("near-duplicate (not identical) paragraphs above the jaccard threshold collapse") {
    import spark.implicits._
    // mutate ONE token of 32: jaccard on 3-shingles ~ (30-3)/(30+3) ≈ 0.82 > 0.7
    val base = (0 until 32).map(i => s"t$i").mkString(" ")
    val mutated = (0 until 32).map(i => if (i == 16) "ZZZ" else s"t$i").mkString(" ")
    val docs = Seq((0L, base), (1L, mutated)).toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(0L) === 0L, "first occurrence survives")
    assert(out(1L) === 1L, "near-dup paragraph dropped")
  }

  test("chunk-key capacity: real-corpus chunk_idx stays far below the stride bound") {
    val docs = Tables(spark, "/root/testdata/sf0.01", "documents")
    val maxChunks = docs
      .select((floor((size(split(col("text"), " ", -1)) - 1) / 32) + 1).as("n"))
      .agg(max("n")).collect()(0).getLong(0)
    assert(maxChunks < Dedup.ParagraphChunkStride,
      s"chunk-key encoding would collide at $maxChunks chunks/doc")
  }

  test("a >1000-chunk document no longer collides its chunk keys into the next doc") {
    import spark.implicits._
    // Under the old doc_id*1000 stride, doc 5 chunk 1000 encoded to the
    // same key as doc 6 chunk 0 — silently merging unrelated paragraphs.
    // Doc 5: 1001 distinct paragraphs; doc 6: [copy of doc 5's chunk 500,
    // its own unique paragraph]. Correct output: doc 5 fully intact (its
    // paragraphs are all first occurrences), doc 6 drops only the copy.
    val bigDoc = (0 to 1000).map(para).mkString(" ")
    val docs = Seq(
      (5L, bigDoc),
      (6L, para(500) + " " + para(2000))).toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap

    assert(out(5L) === ((1001L, 0L, bigDoc)),
      "the 1001-chunk doc keeps every paragraph (all first occurrences)")
    assert(out(6L) === ((2L, 1L, para(2000))),
      "the neighbor doc drops exactly the cross-doc duplicate, nothing else")
  }

  test("chunk-key guard raises instead of silently colliding past the stride") {
    import spark.implicits._
    // stride=4 makes the bound reachable with a 5-chunk doc (window=1)
    val docs = Seq((0L, "a b c d e")).toDF("doc_id", "text")
    val ex = intercept[Exception] {
      Dedup.paragraphDedup(docs, window = 1, stride = 4L).collect()
    }
    val messages = Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(messages.contains("chunk key overflow"), s"unexpected failure: $messages")
  }
}
