package graft

import org.apache.spark.sql.functions._

import graft.operators.IvfIndex
import graft.queries.{Similarity, Tables}

/** q71 SemDeDup: cell-restricted near-dup pairs + CC keep list.
  *
  * The contract under test (see semanticDedupPairs scaladoc): every
  * reported pair is exactly-verified (subset of the exact cosine>=0.4 pair
  * set — zero false positives), recall against that exact set is bounded
  * below (soft top-2-of-8 assignment measured 0.85–0.93 on the testdata
  * corpora; asserted >= 0.75 with margin for quantizer-init variation),
  * and the candidate join is an equi-join — no BNLJ/cartesian ever.
  */
class SemanticDedupSpec extends SparkSpec {

  private def model(dir: String) = IvfIndex.fit(
    Tables(spark, dir, "embeddings").limit(2048).coalesce(1), k = 8, maxIter = 10)

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  for (sf <- Seq("sf0.001", "sf0.01")) {
    test(s"$sf: semantic pairs are a zero-FP subset of exact pairs with recall >= 0.75") {
      val dir = s"/root/testdata/$sf"
      val e = Tables(spark, dir, "embeddings")
      val exact = pairSet(Similarity.blockedNearDupPairs(e, threshold = 0.4))
      val sem = pairSet(Similarity.semanticDedupPairs(e, model(dir), threshold = 0.4))
      assert(exact.nonEmpty, "fixture corpora must contain exact pairs for recall to mean anything")
      assert(sem.subsetOf(exact), s"false-positive pairs: ${sem.diff(exact).take(5)}")
      val recall = sem.intersect(exact).size.toDouble / exact.size
      assert(recall >= 0.75, s"recall $recall < 0.75 (|exact|=${exact.size}, |sem|=${sem.size})")
    }
  }

  test("q71 keep list: one row per doc, keep iff cluster representative, reps are minima") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("q71_semantic_dedup")(spark, dir).collect()
    val n = Tables(spark, dir, "embeddings").count()
    assert(out.length == n)
    out.foreach { r =>
      val (cid, did, keep) = (r.getLong(0), r.getLong(1), r.getInt(2))
      assert(cid <= did, s"cluster_id $cid > doc_id $did")
      assert((keep == 1) == (cid == did), s"keep flag disagrees with representative rule at $did")
    }
    // every dropped doc must be an endpoint of at least one semantic pair
    val e = Tables(spark, dir, "embeddings")
    val pairs = pairSet(Similarity.semanticDedupPairs(e, model(dir), threshold = 0.4))
    val paired = pairs.flatMap(p => Seq(p._1, p._2))
    val dropped = out.filter(_.getInt(2) == 0).map(_.getLong(1)).toSet
    assert(dropped.subsetOf(paired), s"dropped-but-unpaired docs: ${dropped.diff(paired).take(5)}")
  }

  test("candidate generation plans as an equi-join: no BNLJ, no cartesian product") {
    val dir = "/root/testdata/sf0.001"
    val e = Tables(spark, dir, "embeddings")
    val plan = Similarity.semanticDedupPairs(e, model(dir), threshold = 0.4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), "BNLJ in semantic dedup plan")
    assert(!plan.contains("CartesianProduct"), "cartesian product in semantic dedup plan")
  }
}
