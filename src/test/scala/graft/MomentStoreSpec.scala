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
}
