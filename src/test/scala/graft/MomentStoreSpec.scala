package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.{Similarity, Tables}

/** q194's moment store: the merge of per-slice decimal product sums must
  * equal the from-scratch whole-corpus moments EXACTLY (decimal addition
  * is associative; each product rounds to 12 dp once, per value, before
  * any sum) — bit-equal doubles, not approximately-equal ones.
  */
class MomentStoreSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val e = Tables(spark, dir, "embeddings")

  private def rows(df: DataFrame): Seq[Seq[Any]] = df.collect().toSeq.map(_.toSeq)

  test("merged slice sums equal the whole-corpus moments bit-exactly") {
    val merged = Similarity.mergeMomentSums(Seq(
      Similarity.momentSums(e.filter(pmod(col("vec_id"), lit(5)) =!= 0), dim = 64),
      Similarity.momentSums(e.filter(pmod(col("vec_id"), lit(5)) === 0), dim = 64)))
    assert(rows(merged) == rows(Similarity.secondMoments(e, dim = 64)))
  }

  test("q194 registration (store readback + batch absorb) equals the q94 rebuild") {
    assert(rows(Similarity.all("q194_incremental_moments").fn(spark, dir)) ==
      rows(Similarity.all("q94_embed_moments").fn(spark, dir)))
  }

  test("retract equals the survivor rebuild bit-exactly; double retract with onceId is a no-op") {
    val root = java.nio.file.Files.createTempDirectory("graft_moment_retract").toString
    val path = s"$root/moments"
    Similarity.momentSums(e, dim = 64).write
      .option("compression", "zstd").parquet(path)
    val forgotten = e.filter(pmod(col("vec_id"), lit(5)) === 0)

    Similarity.retractFromMomentStore(spark, forgotten, path, onceId = Some("f1"))
    val survivors = e.filter(pmod(col("vec_id"), lit(5)) =!= 0)
    assert(rows(Similarity.mergeMomentSums(Seq(spark.read.parquet(path)))) ==
      rows(Similarity.secondMoments(survivors, dim = 64)),
      "subtracting the forgotten vectors' sums must equal the survivor rebuild")

    // same forgetId again: the witness marker must skip the subtraction
    Similarity.retractFromMomentStore(spark, forgotten, path, onceId = Some("f1"))
    assert(rows(Similarity.mergeMomentSums(Seq(spark.read.parquet(path)))) ==
      rows(Similarity.secondMoments(survivors, dim = 64)),
      "a replayed retract must not double-subtract")
  }

  test("forgetEverywhere refuses a moment store without a forgetId and drives its arm with one") {
    val root = java.nio.file.Files.createTempDirectory("graft_moment_forget").toString
    val path = s"$root/moments"
    Similarity.momentSums(e, dim = 64).write
      .option("compression", "zstd").parquet(path)
    val forgotten = e.filter(pmod(col("vec_id"), lit(5)) === 0)
    val stores = graft.pipeline.Forget.Stores(momentStorePath = Some(path))

    intercept[IllegalArgumentException] {
      graft.pipeline.Forget.forgetEverywhere(
        spark, forgotten.select(col("vec_id").as("doc_id")), forgotten, stores)
    }
    graft.pipeline.Forget.forgetEverywhere(
      spark, forgotten.select(col("vec_id").as("doc_id")), forgotten, stores,
      forgetId = Some("t1"))
    assert(rows(Similarity.mergeMomentSums(Seq(spark.read.parquet(path)))) ==
      rows(Similarity.secondMoments(
        e.filter(pmod(col("vec_id"), lit(5)) =!= 0), dim = 64)))
  }
}
