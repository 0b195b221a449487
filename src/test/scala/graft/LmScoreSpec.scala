package graft

import org.apache.spark.sql.functions._

import graft.queries.{Tables, TextAnalysis}

/** q73 bigram-LM scoring: the smoothing formula is pinned EXACTLY on a
  * fixture whose LM tables fit on paper, and structural invariants are
  * checked on real testdata (n_bigrams = token count - 1; log-likelihoods
  * strictly negative — a smoothed probability can never reach 1 when
  * V >= 2).
  */
class LmScoreSpec extends SparkSpec {
  import spark.implicits._

  test("fixture corpus: scores equal the hand-computed add-one-smoothed values") {
    // corpus: doc0 = "a b a b", doc1 = "a b"
    //   bigram counts: (a,b)->3, (b,a)->1; prefix counts: a->3, b->1; V=2
    //   lp(a,b) = ln((3+1)/(3+2)); lp(b,a) = ln((1+1)/(1+2))
    val docs = Seq((0L, "a b a b"), (1L, "a b")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLmScores(docs).collect()
    val lpAB = math.log(4.0 / 5.0)
    val lpBA = math.log(2.0 / 3.0)
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.length == 2)
    val byId = out.map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(byId(0L)._1 == 3L)
    assert(byId(0L)._2 == r4((2 * lpAB + lpBA) / 3.0))
    assert(byId(1L)._1 == 1L)
    assert(byId(1L)._2 == r4(lpAB))
  }

  test("testdata: n_bigrams = tokens - 1 for every doc, all scores negative") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables(spark, dir, "documents")
    val out = TextAnalysis.bigramLmScores(docs)
    val expected = docs.select(col("doc_id"),
      (size(split(col("text"), " ", -1)) - 1).cast("long").as("want"))
    val bad = out.join(expected, "doc_id")
      .filter(col("n_bigrams") =!= col("want") || col("avg_logp") >= 0).count()
    assert(bad == 0)
    assert(out.count() == docs.count())
  }
}
