package graft

import org.apache.spark.sql.functions._

import graft.functions.{HashExpressions, Text, Vectors}

/** Codegen'd custom expressions cross-checked against the pure-built-in HOF
  * forms (bit-identical semantics contracts).
  */
class ExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("codegen cosine == HOF cosine bit-for-bit on real embeddings") {
    val emb = graft.queries.Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .limit(50).select($"vec_id", $"embedding")
    val a = emb.select($"vec_id".as("ia"), $"embedding".as("va"))
    val b = emb.select($"vec_id".as("ib"), $"embedding".as("vb"))
    val pairs = a.join(b, $"ia" < $"ib")
    val diff = pairs
      .select(
        Vectors.cosine($"va", $"vb").as("fast"),
        Vectors.cosineHof($"va", $"vb").as("ref"))
      .filter($"fast" =!= $"ref")
      .count()
    assert(diff == 0, "codegen cosine must be bit-identical to the HOF form")
  }

  test("codegen simhash64 == HOF simHash on real documents") {
    val docs = graft.queries.Tables(spark, "/root/testdata/sf0.001", "documents").limit(100)
    val diff = docs.select(
      HashExpressions.simHash64(Text.tokens($"text")).as("fast"),
      Text.simHash(Text.tokens($"text")).as("ref"))
      .filter($"fast" =!= $"ref")
      .count()
    assert(diff == 0, "codegen simhash must equal the HOF form")
  }

  test("shingleMinHash: identical token streams → identical signatures, different → different") {
    val df = Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox jumps over the lazy dog",
      "an entirely different stream of tokens goes here")
      .toDF("t")
      .select(HashExpressions.shingleMinHash(Text.tokens($"t")).as("sig"))
    val sigs = df.collect().map(_.getSeq[Long](0))
    assert(sigs(0).size == 32)
    assert(sigs(0) == sigs(1))
    assert(sigs(0) != sigs(2))
  }

  test("shingleMinHash similarity tracks jaccard (near-dup shares most mins)") {
    val df = Seq(
      ("a", "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 w16"),
      ("b", "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 w17"),
      ("c", "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 x11 x12 x13 x14 x15 x16"))
      .toDF("id", "t")
      .select($"id", HashExpressions.shingleMinHash(Text.tokens($"t")).as("sig"))
    val m = df.collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    def agree(x: Seq[Long], y: Seq[Long]) = x.zip(y).count(p => p._1 == p._2)
    assert(agree(m("a"), m("b")) > agree(m("a"), m("c")),
      "near-dup docs must agree on more minhash slots than unrelated docs")
  }

  test("hashed-shingle jaccard == string-shingle jaccard on real documents") {
    val docs = graft.queries.Tables(spark, "/root/testdata/sf0.001", "documents")
      .limit(60)
    val a = docs.select($"doc_id".as("ia"), $"text".as("ta")).filter($"ia" % 2 === 0)
    val b = docs.select($"doc_id".as("ib"), $"text".as("tb")).filter($"ib" % 2 === 1)
    val pairs = a.join(b, $"ia" + 1 === $"ib")
    val diff = pairs.select(
      HashExpressions.jaccardSorted(
        HashExpressions.shingleHashSet(Text.tokens($"ta")),
        HashExpressions.shingleHashSet(Text.tokens($"tb"))).as("fast"),
      Text.jaccard(
        array_distinct(Text.shingles($"ta", 3)),
        array_distinct(Text.shingles($"tb", 3))).as("ref"))
      .filter(abs($"fast" - $"ref") > 1e-12)
      .count()
    assert(diff == 0, "hashed-set jaccard must match exact string-shingle jaccard")
  }

  test("repetitionStats kernel == aggregate-HOF form on real documents") {
    // the q64 kernel swap contract: [n_tok, n_distinct, top_bigram_count]
    // from the one-pass hashed kernel must equal the numbers the original
    // interpreted form computed (string array_distinct + sorted-bigram
    // longest-equal-run) on every testdata document
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val docs = graft.queries.Tables(spark, d, "documents")
      val toks = split($"text", " ", -1)
      val nTok = size(toks)
      val sortedBigrams = when(nTok >= 2,
        array_sort(transform(
          sequence(lit(1), nTok - 1),
          i => concat(element_at(toks, i), lit(" "), element_at(toks, i + 1)))))
        .otherwise(array().cast("array<string>"))
      val topC = aggregate(
        sortedBigrams,
        struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
        (acc, x) => {
          val run = when(x === acc.getField("prev"), acc.getField("run") + 1)
            .otherwise(lit(1L))
          struct(x.as("prev"), run.as("run"),
            greatest(acc.getField("best"), run).as("best"))
        },
        acc => acc.getField("best"))
      val st = HashExpressions.repetitionStats(toks)
      val diff = docs.select(
        st.as("fast"),
        array(nTok.cast("long"), size(array_distinct(toks)).cast("long"), topC).as("ref"))
        .filter($"fast" =!= $"ref")
        .count()
      assert(diff == 0, s"$d: kernel stats must equal the HOF reference form")
    }
  }

  test("jaccardSorted edge cases") {
    val df = Seq(
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L), 1.0),
      (Seq(1L, 2L), Seq(3L, 4L), 0.0),
      (Seq(1L, 2L, 3L, 4L), Seq(3L, 4L, 5L, 6L), 1.0 / 3.0))
      .toDF("a", "b", "want")
    val bad = df.filter(
      abs(HashExpressions.jaccardSorted($"a", $"b") - $"want") > 1e-15).count()
    assert(bad == 0)
  }

  test("dot/l2 kernels match algebra") {
    val df = Seq((Seq(1f, 2f, 3f), Seq(4f, 5f, 6f))).toDF("a", "b")
    val r = df.select(
      Vectors.dot($"a", $"b"),
      Vectors.euclidean($"a", $"b")).head
    assert(r.getDouble(0) == 32.0)
    assert(math.abs(r.getDouble(1) - math.sqrt(27.0)) < 1e-12)
  }
}
