package graft

import org.apache.spark.sql.functions._

import graft.functions.{Text, Vectors}

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, input: String): T =
    Seq(input).toDF("t").select(c).head.get(0).asInstanceOf[T]

  test("tokenCountPortable counts whitespace fields; empty → 0") {
    assert(one[Long](Text.tokenCountPortable($"t"), "a b c") == 3L)
    assert(one[Long](Text.tokenCountPortable($"t"), "  padded  ") == 1L)
    assert(one[Long](Text.tokenCountPortable($"t"), "") == 0L)
  }

  test("cleanText masks emails and urls, collapses whitespace, lowercases") {
    val in = "Contact Bob.Smith+x@Example.ORG  or   https://a.example/path?q=1 \t NOW"
    assert(one[String](Text.cleanText($"t"), in) == "contact <email> or <url> now")
    assert(one[Long](Text.matchCount($"t", Text.EmailPattern), in) == 1L)
    assert(one[Long](Text.matchCount($"t", Text.UrlPattern), in) == 1L)
    assert(one[Long](Text.matchCount($"t", Text.EmailPattern), "no pii here") == 0L)
  }

  test("shingles: 3-word windows; short text → whole-text shingle") {
    def shing(s: String): Seq[String] =
      Seq(s).toDF("t").select(Text.shingles($"t", 3)).head.getSeq[String](0).toSeq
    assert(shing("a b c d") == Seq("a b c", "b c d"))
    assert(shing("a b") == Seq("a b"))
  }

  test("minhash: identical shingle sets → identical signatures; signature length = numPerm") {
    val df = Seq("the quick brown fox jumps", "the quick brown fox jumps", "totally different words here now")
      .toDF("t")
      .select(Text.minHashSignature(Text.shingles($"t", 3), 16).as("sig"))
    val sigs = df.collect().map(_.getSeq[Long](0))
    assert(sigs(0).size == 16)
    assert(sigs(0) == sigs(1))
    assert(sigs(0) != sigs(2))
  }

  test("simhash: near-identical docs are close in hamming, unrelated docs far") {
    val docs = Seq(
      ("a", "spark query engine with fast columnar scans and vectorized execution today"),
      ("b", "spark query engine with fast columnar scans and vectorized execution tomorrow"),
      ("c", "completely unrelated text about gardening tulips soil watering sunshine bees"))
      .toDF("id", "t")
      .select($"id", Text.simHash(Text.tokens($"t")).as("s"))
    val m = docs.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(m("a"), m("b")) < ham(m("a"), m("c")),
      s"near-dup hamming ${ham(m("a"), m("b"))} should be < unrelated ${ham(m("a"), m("c"))}")
  }

  test("jaccard of identical sets is 1.0, disjoint is 0.0") {
    val df = Seq((Seq("a", "b"), Seq("a", "b"), Seq("c", "d")))
      .toDF("x", "y", "z")
    val r = df.select(
      Text.jaccard($"x", $"y"),
      Text.jaccard($"x", $"z")).head
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 0.0)
  }

  test("langId picks the profile with most stopword hits") {
    assert(one[String](Text.langId($"t"), "the cat and the dog is on the mat") == "en")
    assert(one[String](Text.langId($"t"), "der hund und die katze ist da") == "de")
    assert(one[String](Text.langId($"t"), "xyzzy qwerty") == "und")
  }

  test("qualityScore is in [0,1] and favors normal text") {
    val good = one[Double](Text.qualityScore($"t"),
      "a perfectly reasonable sentence with normal words and good length overall")
    val bad = one[Double](Text.qualityScore($"t"), "x")
    assert(good > bad && good <= 1.0 && bad >= 0.0)
  }

  test("fingerprints are normalization-stable") {
    val df = Seq(("  Hello World ", "hello world")).toDF("a", "b")
    val r = df.select(
      Text.fingerprint($"a") === Text.fingerprint($"b"),
      Text.fingerprint64($"a") === Text.fingerprint64($"b")).head
    assert(r.getBoolean(0) && r.getBoolean(1))
  }

  test("tokenEstimate >= word count for long words") {
    assert(one[Long](Text.tokenEstimate($"t"), "internationalization ok") == 6L) // ceil(20/4)+1
  }
}

class VectorsSpec extends SparkSpec {
  import spark.implicits._

  test("cosine of parallel/orthogonal/antiparallel vectors") {
    val df = Seq((
      Seq(1f, 0f, 0f), Seq(2f, 0f, 0f), Seq(0f, 3f, 0f), Seq(-1f, 0f, 0f)))
      .toDF("a", "b", "c", "d")
    val r = df.select(
      Vectors.cosine($"a", $"b"), Vectors.cosine($"a", $"c"), Vectors.cosine($"a", $"d")).head
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1)) < 1e-12)
    assert(math.abs(r.getDouble(2) + 1.0) < 1e-12)
  }

  test("euclidean distance") {
    val df = Seq((Seq(0f, 0f), Seq(3f, 4f))).toDF("a", "b")
    assert(math.abs(df.select(Vectors.euclidean($"a", $"b")).head.getDouble(0) - 5.0) < 1e-12)
  }

  test("signBucket: same signs → same bucket, flipped sign → different bucket") {
    val df = Seq((
      Seq(1f, -2f, 3f, 1f, 1f, 1f, 1f, 1f),
      Seq(9f, -1f, 8f, 2f, 3f, 4f, 5f, 6f),
      Seq(-1f, -2f, 3f, 1f, 1f, 1f, 1f, 1f))).toDF("a", "b", "c")
    val r = df.select(
      Vectors.signBucket($"a"), Vectors.signBucket($"b"), Vectors.signBucket($"c")).head
    assert(r.getLong(0) == r.getLong(1))
    assert(r.getLong(0) != r.getLong(2))
  }
}
