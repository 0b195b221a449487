package graft

import org.apache.spark.sql.functions._

import graft.queries.{Tables, TextAnalysis}

/** q106's value-level contract: the trained char-bigram NB recovers every
  * holdout label (markers are decisive by construction), the decision
  * margins are orders of magnitude above libm ulps (the cross-engine
  * argmax-safety argument), and a planted misclassification — a doc whose
  * text carries ANOTHER language's marker — flips exactly as the model
  * should flip it.
  */
class LangIdSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"

  test("holdout confusion is diagonal on the testdata corpus") {
    val conf = TextAnalysis.langIdConfusion(Tables(spark, sfDir, "documents")).collect()
    assert(conf.nonEmpty)
    conf.foreach { r =>
      assert(r.getString(0) === r.getString(1),
        s"off-diagonal confusion: ${r.getString(0)} predicted as ${r.getString(1)}")
    }
  }

  test("decision margins are tens of nats, not ulps") {
    val scores = TextAnalysis.langIdScores(Tables(spark, sfDir, "documents"))
    val margins = scores
      .groupBy("doc_id", "lang")
      .agg(max(when(col("cls") === col("lang"), col("s"))).as("s_true"),
        max(when(col("cls") =!= col("lang"), col("s"))).as("s_best_other"))
      .select(min(col("s_true") - col("s_best_other")).as("min_margin"))
      .collect()(0).getDouble(0)
    assert(margins > 10.0, s"min true-vs-best-other margin $margins nats — too tight")
  }

  test("planted misclassification: a doc carrying another language's marker flips") {
    import spark.implicits._
    // doc 0 claims lang 'en' but its TEXT carries the 'de' marker bigrams;
    // with doc_id 0 it lands in the holdout split. The model must predict
    // 'de' for it — a real LID catches mislabeled rows, which is the point
    // of training one.
    // lang blocks of 7 over a 35-cycle so every language appears in BOTH
    // splits (a plain i%5 cycle would perfectly correlate lang with the
    // doc_id%5 split). The foreign marker repeats 3x so it outweighs the
    // single true-label marker the pipeline appends.
    val base = "the data table join group window batch spark row column " * 3
    val docs = (0 until 70).map { i =>
      val lang = Seq("en", "de", "es", "fr", "zh")((i % 35) / 7)
      val text = if (i == 0) base + " 2323232323 2323232323 2323232323" else base
      (i.toLong, text, lang)
    }.toDF("doc_id", "text", "lang")
    val pred = TextAnalysis.langIdScores(docs)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("s").desc, col("cls"))
    val top = pred.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    val doc0 = top.filter(col("doc_id") === 0).select("cls").collect()(0).getString(0)
    assert(doc0 === "de", s"mislabeled doc predicted $doc0, expected de")
  }
}
