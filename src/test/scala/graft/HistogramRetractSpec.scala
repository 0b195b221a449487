package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.{Curation, Tables}

/** The histogram store's count-subtraction retraction (q152): exact
  * un-absorb by the mergeable-statistic argument, plus the loud-underflow
  * contract the corpus-scale stores can't afford — retracting a batch
  * that was never absorbed must RAISE, not silently write a corrupt
  * store.
  */
class HistogramRetractSpec extends SparkSpec {

  private def docs(rows: Seq[(Long, String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "source", "text")
  }

  private def hist(path: String): Map[(String, Long), Long] =
    spark.read.parquet(path).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString + "/store"

  test("absorb then retract restores the exact (source, score, n) table") {
    // "a b" scores floor(1000*2/3) = 666; "ab" scores 1000 — two distinct
    // planted score cells per source
    val base = docs(Seq((1L, "s0", "a b"), (2L, "s0", "ab"), (3L, "s1", "a b")))
    val batch = docs(Seq((10L, "s0", "a b"), (11L, "s1", "cd")))
    val path = tmp("graft_qhist_roundtrip")
    Curation.scoreHistogram(base).write.parquet(path)
    val before = hist(path)
    assert(before == Map(("s0", 666L) -> 1L, ("s0", 1000L) -> 1L, ("s1", 666L) -> 1L))

    Curation.absorbIntoHistogramStore(spark, batch, path)
    assert(hist(path) == Map(
      ("s0", 666L) -> 2L, ("s0", 1000L) -> 1L,
      ("s1", 666L) -> 1L, ("s1", 1000L) -> 1L))

    Curation.retractFromHistogramStore(spark, batch, path)
    assert(hist(path) == before,
      "retract must restore the exact pre-absorb histogram")
  }

  test("retracting a batch that was never absorbed raises underflow") {
    val base = docs(Seq((1L, "s0", "a b")))
    val phantom = docs(Seq((9L, "s0", "ab")))
    val path = tmp("graft_qhist_underflow")
    Curation.scoreHistogram(base).write.parquet(path)
    val e = intercept[Exception] {
      Curation.retractFromHistogramStore(spark, phantom, path)
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("underflow")),
      s"expected the underflow guard to fire, got: $e")
    // the failed write-aside must not have swapped in: store unchanged
    assert(hist(path) == Map(("s0", 666L) -> 1L))
  }

  test("q152 lifecycle on the corpus: absorb-absorb-retract equals one-shot rebuild") {
    val all = Tables(spark, "/root/testdata/sf0.001", "documents")
    val path = tmp("graft_qhist_corpus")
    Curation.scoreHistogram(all.filter(pmod(col("doc_id"), lit(5)) > 1))
      .write.parquet(path)
    Curation.absorbIntoHistogramStore(
      spark, all.filter(pmod(col("doc_id"), lit(5)) === 1), path)
    val flagged = all.filter(pmod(col("doc_id"), lit(5)) === 0)
    Curation.absorbIntoHistogramStore(spark, flagged, path)
    Curation.retractFromHistogramStore(spark, flagged, path)
    val rebuilt = Curation
      .scoreHistogram(all.filter(pmod(col("doc_id"), lit(5)) =!= 0))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(hist(path) == rebuilt,
      "retracted store must equal the from-scratch rebuild, count for count")
  }
}
