package graft

import org.apache.spark.sql.functions._

import graft.functions.Vectors
import graft.queries.{Extras, Similarity, Tables}

/** Similarity-search behaviors added in round 2: the blocked theta-join
  * (exact all-pairs without a nested-loop join), multi-probe LSH recall,
  * and the approximate-median profile knob.
  */
class SimilaritySpec extends SparkSpec {

  private lazy val corpus = Tables(spark, "/root/testdata/sf0.001", "embeddings")

  test("blocked theta-join equals the naive all-pairs result exactly") {
    val naive = {
      val a = corpus.select(col("vec_id").as("id_a"), col("embedding").as("va"))
      val b = corpus.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
      a.join(b, col("id_a") < col("id_b"))
        .filter(Vectors.cosine(col("va"), col("vb")) >= 0.4)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val blocked = Similarity.blockedNearDupPairs(corpus, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.nonEmpty, "fixture must contain near-dup pairs")
    assert(blocked == naive, s"blocked join must be exact: " +
      s"missing=${(naive -- blocked).take(5)} extra=${(blocked -- naive).take(5)}")
  }

  test("blocked theta-join plans no nested-loop or cartesian join") {
    val plan = Similarity.blockedNearDupPairs(corpus, threshold = 0.4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.linesIterator.take(20).mkString("\n"))
    assert(!plan.contains("CartesianProduct"), plan.linesIterator.take(20).mkString("\n"))
  }

  test("semantic decontam flags exactly the train vectors with a close eval neighbor") {
    // independent replay of the q155 predicate over the corpus split
    val ev = corpus.filter(col("vec_id") < 20)
      .select(col("vec_id").as("eval_id"), col("embedding").as("ev"))
    val tr = corpus.filter(col("vec_id") >= 20)
      .select(col("vec_id"), col("embedding"))
    val expected = tr.join(ev, Vectors.cosine(col("embedding"), col("ev")) >= 0.4)
      .groupBy("vec_id")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.min("eval_id").as("f"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val got = Similarity.semanticDecontam(
      corpus.filter(col("vec_id") >= 20), corpus.filter(col("vec_id") < 20), 0.4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected)
    assert(got.nonEmpty,
      "fixture drift: the planted clusters should put train vectors near eval ones")
    // and none of the flagged rows may be an eval vector itself
    assert(got.keySet.forall(_ >= 20))
  }

  test("multi-probe LSH: recall grows monotonically with probe radius, >=0.9 when widened") {
    val queries = corpus.filter(col("vec_id") < 20)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(queries, corpus, k = 5))
    def recall(bits: Int, ph: Int) = {
      val got = pairs(Similarity.lshTopK(queries, corpus, k = 5, bits = bits, probeHamming = ph))
      (exact & got).size.toDouble / exact.size
    }
    val r0 = recall(bits = 4, ph = 0)
    val r1 = recall(bits = 4, ph = 1)
    val r3 = recall(bits = 4, ph = 3)
    assert(r1 >= r0, s"multi-probe ($r1) must not lose recall vs single-probe ($r0)")
    assert(r3 >= r1, s"wider probing ($r3) must not lose recall vs narrow ($r1)")
    // this corpus has no tight angular neighbors (top-5 cosine 0.26-0.43),
    // so 0.9 recall needs the widened probe radius — see lshTopK docs
    assert(r3 >= 0.9, s"recall@5 = $r3 with Hamming<=3 probing over 4 bits")
  }

  test("approx-median profile matches exact profile within sketch tolerance") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val exact = Extras.profile(docs, approxMedian = false)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val approx = Extras.profile(docs, approxMedian = true)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (src, med) =>
      // percentile_approx at accuracy 10000 on a few hundred rows per group
      // is rank-exact up to interpolation: allow one neighboring value
      assert(math.abs(approx(src) - med) <= math.max(2.0, med * 0.02),
        s"source=$src exact=$med approx=${approx(src)}")
    }
  }

  test("label purity (q84): confusion matrix exact on a hand-computed fixture") {
    import spark.implicits._
    // vec 4 is a PLANTED misclassification: labeled 0 but sitting in label
    // 1's direction. Centroids INCLUDE the point itself (standard), so
    // c0 = mean([1,.1],[.9,-.1],[.2,.9]) = [0.7, 0.3] and c1 = [0, 0.9];
    // cos(v4,c0) ≈ 0.58 < cos(v4,c1) ≈ 0.98 — margins far above any ulp
    // concern.
    val emb = Seq(
      (0L, Array(1.0f, 0.1f), 0),
      (1L, Array(0.9f, -0.1f), 0),
      (2L, Array(0.1f, 1.0f), 1),
      (3L, Array(-0.1f, 0.8f), 1),
      (4L, Array(0.2f, 0.9f), 0)
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.labelPurity(emb).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got == Map((0, 0) -> 2L, (0, 1) -> 1L, (1, 1) -> 2L), s"got $got")
  }

  test("label purity (q84) has real signal on the testdata corpus") {
    val rows = SparkEntry.queries("q84_label_purity")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val total = rows.map(_._3).sum
    val diag = rows.collect { case (l, p, n) if l == p => n }.sum
    // 10 labels → chance diagonal ≈ 0.1; the corpus embeddings carry label
    // geometry (sf0.01 measures ~0.41). Loose floor: well above chance.
    assert(total > 0 && diag.toDouble / total > 0.2,
      s"diag=$diag total=$total")
  }

  test("q168 embedding integrity: planted damage detected; clean fixture audits zero") {
    import spark.implicits._
    // planted per damage class: wrong dim, NaN element, all-zero vector,
    // and one healthy control
    val planted = Seq(
      (1L, Array(1.0f, 2.0f), 0),
      (2L, Array(1.0f, Float.NaN, 3.0f), 0),
      (3L, Array(0.0f, 0.0f, 0.0f), 1),
      (4L, Array(1.0f, 2.0f, 3.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.embeddingIntegrity(planted, dim = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == Seq((0, 2L, 1L, 1L, 0L), (1, 2L, 0L, 0L, 1L)), s"got $got")

    val corpus = SparkEntry.queries("q168_embedding_integrity")(
      spark, "/root/testdata/sf0.001").collect()
    assert(corpus.length == 10)
    corpus.foreach { r =>
      assert(r.getLong(2) == 0 && r.getLong(3) == 0 && r.getLong(4) == 0,
        s"clean fixture must audit zero violations: $r")
      assert(r.getLong(1) > 0)
    }
  }

  test("vector artifact sync gauge reads duplicates, missing ids and orphans correctly") {
    import spark.implicits._
    // planted desync: int8 has a replayed-append dup AND is missing id 3;
    // pq carries an orphan id the float index lacks
    val rows = Seq(
      ("float", 1L), ("float", 2L), ("float", 3L),
      ("int8", 1L), ("int8", 2L), ("int8", 2L),
      ("pq", 1L), ("pq", 2L), ("pq", 3L), ("pq", 9L)
    ).toDF("artifact", "vec_id")
    val out = Similarity.vectorArtifactSync(rows).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(out == Seq(
      ("float", 3L, 3L, 0L, 0L),
      ("int8", 3L, 2L, 1L, 0L),
      ("pq", 4L, 4L, 0L, 1L)),
      s"gauge misread the planted desync: $out")
  }
}
