package graft

import org.apache.spark.sql.functions._

import graft.queries.{Tables, TextAnalysis}

/** q90 (BPE tokenizer application): artifact provenance, exact agreement
  * with a plain-Scala classic encoder, and the representation-safety
  * property the replace-chain design rests on.
  */
class BpeEncodeSpec extends SparkSpec {

  import spark.implicits._

  /** Classic BPE encode: chars of lower(text) as the start symbols, each
    * merge applied in rank order, greedily left-to-right, non-overlapping.
    * Spaces are symbols no merge contains, so words stay isolated.
    */
  private def referenceEncode(text: String): Vector[String] = {
    val toks = scala.collection.mutable.ArrayBuffer.from(
      text.toLowerCase.map(_.toString))
    for ((l, r) <- TextAnalysis.BpeMergesPinned) {
      var i = 0
      while (i < toks.length - 1) {
        if (toks(i) == l && toks(i + 1) == r) {
          toks(i) = l + r
          toks.remove(i + 1)
        }
        i += 1
      }
    }
    toks.toVector
  }

  test("pinned merge artifact is exactly q69's trained output on sf0.01 (provenance)") {
    val learned = graft.operators.BpeTrainer
      .learn(Tables(spark, "/root/testdata/sf0.01", "documents"), numMerges = 16)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(learned == TextAnalysis.BpeMergesPinned,
      s"artifact drifted from training output: $learned")
    // the property the <sym> representation's unambiguity proof needs
    for ((l, r) <- TextAnalysis.BpeMergesPinned)
      assert((l + r).matches("[a-z0-9]+"), s"symbol with reserved chars: ($l, $r)")
  }

  test("replace-chain encode agrees with the classic reference encoder exactly") {
    val fixtures = Seq(
      "power steer master hash row",      // multi-merge words (h+ash, r+ow)
      "ererer rrr ererererer",            // overlapping same-pair runs
      "JOIN join joint JOINER",           // case folding + longest merges
      "a  b   c",                         // runs of spaces stay isolated tokens
      "",                                 // empty doc
      "parero aster lulu",                // chained merges (p+ar, a+s...)
      "a<b>c <<>> <er>",                  // literal angle brackets in the input
      "x",                                // single char
      "hashhash rowrow ownown")           // merge results adjacent to themselves
    val got = fixtures.toDF("text")
      .select(TextAnalysis.bpeEncode(col("text")).as("e"))
      .as[String].collect()
    for ((text, enc) <- fixtures.zip(got)) {
      val expect = referenceEncode(text).map(t => s"<$t>").mkString
      assert(enc == expect, s"encode('$text') = '$enc', reference '$expect'")
    }
  }

  test("null text null-propagates and bracket-stripping round-trips lower(text)") {
    val df = Seq[(java.lang.Long, String)]((1L, "Hash Power JOIN"), (2L, null))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.bpeEncode(col("text")).as("e"))
    val rows = df.collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(rows(2L) == null)
    val stripped = rows(1L).replace("<", "").replace(">", "")
    assert(stripped == "hash power join", s"round-trip broke: $stripped")
  }

  test("token counts on the real corpus: encode only ever shrinks, never below 1 per word") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val enc = TextAnalysis.bpeEncode(col("text"))
    val bad = docs
      .filter(col("text").isNotNull && length(col("text")) > 0)
      .select(
        col("doc_id"),
        (length(enc) - length(replace(enc, lit("<"), lit(""))) -
          (length(col("text")) - length(replace(col("text"), lit(" "), lit("")))))
          .as("n_tokens"),
        (length(col("text")) - length(replace(col("text"), lit(" "), lit("")))).as("n_sp"),
        length(col("text")).as("n_chars"))
      .filter(col("n_tokens") > col("n_chars") - col("n_sp") ||
        col("n_tokens") < (col("n_sp") + 1))
      .count()
    assert(bad == 0, s"$bad docs with token counts outside [words, chars]")
  }
}
