package graft

import org.apache.spark.sql.functions._

import graft.queries.{Curation, Tables}

/** Holdout-accuracy and margin checks for the trained NB quality
  * classifier (q88).
  */
class QualityClassifierSpec extends SparkSpec {

  import spark.implicits._

  private val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  test("holdout accuracy is near-perfect on the planted-label corpora") {
    for (d <- dirs) {
      val conf = Curation.all("q88_nb_quality").fn(spark, d).collect()
        .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
      val total = conf.values.sum
      val correct = conf.getOrElse(("clean", "clean"), 0L) +
        conf.getOrElse(("junk", "junk"), 0L)
      assert(total > 0, s"$d: empty holdout")
      assert(correct.toDouble / total >= 0.95,
        s"$d: holdout accuracy ${correct.toDouble / total} (confusion $conf)")
    }
  }

  test("decision margins are orders of magnitude above libm noise (hash-safety contract)") {
    // the oracle compares argmax decisions computed by two different math
    // libraries; that is only deterministic because no holdout doc sits
    // near the decision boundary
    for (d <- dirs) {
      val minMargin = Curation.nbQualityScores(Tables(spark, d, "documents"))
        .select(abs(col("s_clean") - col("s_junk")).as("m"))
        .agg(min("m")).head().getDouble(0)
      assert(minMargin > 0.5, s"$d: min |s_clean - s_junk| = $minMargin nats")
    }
  }

  test("unseen holdout tokens smooth instead of crashing or dominating") {
    // holdout doc 0 carries a token absent from every train doc; the
    // classifier must score it via Laplace smoothing and still call the
    // clean/junk plant correctly
    val docs = (0L until 40L).map { id =>
      val base = s"alpha bravo charlie delta echo tok$id"
      (id, if (id == 0L) base + " zzzunseenzzz" else base)
    }.toDF("doc_id", "text")
    val conf = Curation.nbQuality(docs).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val total = conf.values.sum
    val correct = conf.getOrElse(("clean", "clean"), 0L) +
      conf.getOrElse(("junk", "junk"), 0L)
    assert(total == 8, s"expected 8 holdout docs, got $total ($conf)")
    assert(correct == total, s"smoothing broke classification: $conf")
  }
}
