package graft

import org.apache.spark.sql.functions._

import graft.operators.BpeTrainer

/** BPE induction correctness: the distributed trainer must learn the
  * IDENTICAL merge sequence (same pairs, same order, same counts) as the
  * plain-Scala exact reference trainer — on a textbook corpus and on real
  * testdata word counts.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("textbook corpus: learned merges match the exact reference, including tie-breaks") {
    // the classic low/lower/newest example; counts chosen so early rounds
    // have strict winners and later rounds exercise the lexicographic tie
    val docs = Seq(
      ("low low low low low lower lower newest newest newest"),
      ("newest newest newest widest widest widest")
    ).toDF("text")
    val wc = BpeTrainer.wordCounts(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wc == Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L))
    val expected = BpeTrainer.referenceBpe(wc, numMerges = 10)
    val got = BpeTrainer.learnMerges(docs, numMerges = 10)
    assert(got == expected, s"distributed=$got vs reference=$expected")
    // sanity on the classic outcome: 'es'+'t' family dominates ('newest' x6
    // + 'widest' x3 share es/st), and every merge respected minPairCount
    assert(expected.nonEmpty && expected.forall(_.pairCount >= 2L))
  }

  test("greedy left-to-right merge rule: overlapping pairs do not double-merge") {
    // "aaaa" with merge (a,a): greedy LTR gives [aa, aa]; "aaa" gives [aa, a]
    val syms = Seq(Seq("a", "a", "a", "a"), Seq("a", "a", "a")).toDF("syms")
    val merged = syms.select(
      graft.functions.HashExpressions.bpeMergePair(col("syms"), "a", "a").as("m"))
      .collect().map(_.getSeq[String](0).toList).toList
    assert(merged == List(List("aa", "aa"), List("aa", "a")))
    // and the trainer counts overlapping occurrences the reference way:
    // [a,a,a,a] contributes 3 adjacent (a,a) positions, [a,a,a] gives 2
    val wc = Map("aaaa" -> 1L, "aaa" -> 1L)
    val ref = BpeTrainer.referenceBpe(wc, numMerges = 1)
    assert(ref.head.pairCount == 5L)
    val got = BpeTrainer.learnMerges(
      Seq("aaaa aaa").toDF("text"), numMerges = 1)
    assert(got == ref)
  }

  test("real testdata: distributed trainer == exact reference on sf0.001 and sf0.01") {
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val docs = graft.queries.Tables(spark, d, "documents")
      val wc = BpeTrainer.wordCounts(docs).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val expected = BpeTrainer.referenceBpe(wc, numMerges = 16)
      val got = BpeTrainer.learnMerges(docs, numMerges = 16)
      assert(got == expected, s"$d: distributed=$got vs reference=$expected")
      assert(got.size == 16, s"$d: a real corpus must sustain 16 merges")
      // ranks are dense from 0 and counts non-increasing is NOT guaranteed
      // (a merge can create a new dominant pair), but ranks must be ordered
      assert(got.map(_.rank) == (0 until 16))
    }
  }

  test("q69 registry entry returns the merge table ordered by rank") {
    val rows = SparkEntry.queries("q69_bpe_learn")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length == 16)
    assert(rows.map(_.getInt(0)).toSeq == (0 until 16))
    assert(rows.forall(_.getLong(3) >= 2L))
  }
}
