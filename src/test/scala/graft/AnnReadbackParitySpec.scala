package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{IvfIndex, PqIndex}
import graft.queries.{Dedup, Similarity, Tables}

/** Round-14 dump-readback reshape parity: each reshaped ANN/vector
  * registration (candidates/shortlist dumped pid-scoped, scored off the
  * READBACK) must stay value-identical to its fused operator form — the
  * drift pin for the oracle move. If a reshape ever diverges from the
  * operator it claims to oracle, this spec names the query before the
  * driver gate does.
  */
class AnnReadbackParitySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Seq[Seq[Any]] = df.collect().toSeq.map(_.toSeq)

  private lazy val e = Tables(spark, dir, "embeddings")
  private lazy val queries10 = e.filter(col("vec_id") < 10)

  test("q34 readback path equals the fused simhashPairs") {
    assert(rows(Dedup.all("q34_dedup_simhash").fn(spark, dir)) ==
      rows(Dedup.simhashPairs(Tables(spark, dir, "documents"), maxHamming = 8)
        .orderBy("a", "b")))
  }

  test("q38 readback path equals the fused lshTopK") {
    assert(rows(Similarity.all("q38_knn_lsh").fn(spark, dir)) ==
      rows(Similarity.lshTopK(queries10, e, k = 5, bits = 4, probeHamming = 2)
        .select("query_id", "neighbor_id", "rank").orderBy("query_id", "rank")))
  }

  test("q42 readback path equals the fused IvfIndex.search") {
    assert(rows(Similarity.all("q42_knn_ivf").fn(spark, dir)) ==
      rows(IvfIndex.search(Similarity.modelFor(e, dir), queries10, e, k = 5, nProbe = 4)
        .select("query_id", "neighbor_id", "rank").orderBy("query_id", "rank")))
  }

  test("q56 readback path equals the fused searchIndexed over the persisted index") {
    val model = Similarity.modelFor(e, dir)
    val path = Similarity.persistedIndex(model, e, dir)
    assert(rows(Similarity.all("q56_knn_ivf_persisted").fn(spark, dir)) ==
      rows(IvfIndex.searchIndexed(model, queries10, spark.read.parquet(path),
          k = 5, nProbe = 4)
        .select("query_id", "neighbor_id", "rank").orderBy("query_id", "rank")))
  }

  test("q62 readback path equals the fused searchIndexedQuantized") {
    val model = Similarity.modelFor(e, dir)
    val qPath = Similarity.persistedQuantizedIndex(model, e, dir)
    val fPath = Similarity.persistedIndex(model, e, dir)
    assert(rows(Similarity.all("q62_knn_ivf_quantized").fn(spark, dir)) ==
      rows(IvfIndex.searchIndexedQuantized(model, queries10,
          spark.read.parquet(qPath), spark.read.parquet(fPath), k = 5, nProbe = 4)
        .select("query_id", "neighbor_id", "rank").orderBy("query_id", "rank")))
  }

  test("q117 readback path equals the fused PqIndex.searchIndexed") {
    val ivf = Similarity.modelFor(e, dir)
    val pq = Similarity.pqModelFor(e, dir)
    assert(rows(Similarity.all("q117_knn_ivfpq").fn(spark, dir)) ==
      rows(PqIndex.searchIndexed(ivf, pq, queries10,
          spark.read.parquet(Similarity.persistedPqIndex(ivf, pq, e, dir)),
          spark.read.parquet(Similarity.persistedIndex(ivf, e, dir)),
          k = 5, nProbe = 4)
        .select("query_id", "neighbor_id", "rank").orderBy("query_id", "rank")))
  }

  test("q71 readback path equals the fused semanticDedupPairs component fold") {
    val comps = graft.operators.ConnectedComponents.run(
      e.select(col("vec_id").as("id")),
      Similarity.semanticDedupPairs(e, Similarity.dedupModelFor(e, dir), threshold = 0.4)
        .select(col("id_a").as("src"), col("id_b").as("dst")))
    assert(rows(Similarity.all("q71_semantic_dedup").fn(spark, dir)) ==
      rows(comps.select(
        col("component").as("cluster_id"),
        col("id").as("doc_id"),
        when(col("component") === col("id"), 1).otherwise(0).as("keep"))
        .orderBy("doc_id")))
  }

  test("q95 readback path equals the fused pcaProject bit-exactly") {
    assert(rows(Similarity.all("q95_pca_project").fn(spark, dir)) ==
      rows(Similarity.pcaProject(e, dim = 64, nComponents = 2)))
  }

  test("q173 readback path equals the fused ivfRecallSweep") {
    assert(rows(Similarity.all("q173_ivf_recall_sweep").fn(spark, dir)) ==
      rows(Similarity.ivfRecallSweep(Similarity.modelFor(e, dir),
        e.filter(col("vec_id") < 100), e, k = 5)))
  }
}
