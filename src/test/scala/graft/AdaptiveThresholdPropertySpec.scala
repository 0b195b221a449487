package graft

import scala.util.Random

/** Property coverage for the q115/q118/q121 histogram-threshold family
  * across random corpora and keep fractions — the invariants the fixed
  * oracle points can't cover:
  *
  *   1. the per-source keep-set reaches ceil(p·n) and is MINIMAL up to
  *      boundary ties (excluding the threshold score drops below target);
  *   2. the threshold solve is a pure function of the score HISTOGRAM —
  *      merging histograms from ANY partition of the corpus re-solves
  *      identically (the q121 mergeable-statistic property, tried over
  *      random split boundaries, not just the registered %5);
  *   3. curriculum stages tile the score axis: cumulative mass through
  *      stage k reaches ceil(k·n/stages) and equal scores share a stage.
  *
  * Seeded `Random` (reproducible, offline-cache-safe — same convention as
  * the other property specs).
  */
class AdaptiveThresholdPropertySpec extends SparkSpec {

  private case class Doc(doc_id: Long, source: String, text: String)

  private def randomCorpus(rnd: Random, nDocs: Int, nSources: Int): Seq[Doc] =
    (0 until nDocs).map { id =>
      val words = 1 + rnd.nextInt(30)
      // vary word length AND trailing spaces so the density score spreads
      val body = Seq.fill(words)("x" * (1 + rnd.nextInt(8))).mkString(" ")
      Doc(id.toLong, s"s${rnd.nextInt(nSources)}", body)
    }

  test("keep-set reaches ceil(p*n) per source and is minimal up to ties") {
    val rnd = new Random(77L)
    for (trial <- 1 to 8) {
      val p = 0.1 + rnd.nextDouble() * 0.85
      val docs = spark.createDataFrame(randomCorpus(rnd, 60 + rnd.nextInt(140), 4))
      val out = graft.queries.Curation.adaptiveQualityFilter(docs, keepFraction = p)
        .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getInt(4)))
      assert(out.nonEmpty)
      out.groupBy(_._1).foreach { case (src, ds) =>
        val label = s"trial $trial p=$p source=$src n=${ds.length}"
        val target = math.ceil(p * ds.length).toLong
        val thr = ds.head._3
        assert(ds.forall(_._3 == thr), label)
        assert(ds.count(_._4 == 1) >= target, s"$label: keep-set below target")
        assert(ds.count(_._2 > thr) < target, s"$label: threshold not tight")
        ds.foreach { case (_, score, t, keep) =>
          assert((keep == 1) == (score >= t), s"$label: keep flag mismatch")
        }
      }
    }
  }

  test("threshold solve is split-invariant: any histogram partition merges to the same answer") {
    val rnd = new Random(78L)
    for (trial <- 1 to 6) {
      val corpus = randomCorpus(rnd, 80 + rnd.nextInt(80), 3)
      val docs = spark.createDataFrame(corpus)
      val whole = graft.queries.Curation.incrementalThresholds(
        graft.queries.Curation.scoreHistogram(docs.limit(0)), docs, keepFraction = 0.7)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      // random split boundary per trial
      val m = 2 + rnd.nextInt(5)
      val cut = rnd.nextInt(m)
      import org.apache.spark.sql.functions.{col, lit, pmod}
      val stored = docs.filter(pmod(col("doc_id"), lit(m)) =!= cut)
      val batch = docs.filter(pmod(col("doc_id"), lit(m)) === cut)
      val merged = graft.queries.Curation.incrementalThresholds(
        graft.queries.Curation.scoreHistogram(stored), batch, keepFraction = 0.7)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(merged == whole, s"trial $trial (m=$m cut=$cut): merge diverged from whole-corpus solve")
    }
  }

  test("curriculum stages tile the score axis for random stage counts") {
    val rnd = new Random(79L)
    for (trial <- 1 to 6) {
      val stages = 2 + rnd.nextInt(7)
      val docs = spark.createDataFrame(randomCorpus(rnd, 60 + rnd.nextInt(120), 3))
      val out = graft.queries.Curation.curriculumStages(docs, stages)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      val n = out.length
      val label = s"trial $trial stages=$stages n=$n"
      assert(out.forall(t => t._3 >= 1 && t._3 <= stages), label)
      out.groupBy(_._2).foreach { case (score, ds) =>
        assert(ds.map(_._3).distinct.length == 1, s"$label: score $score split across stages")
      }
      // stage ordering follows score ordering
      val stageOfSorted = out.sortBy(_._2).map(_._3)
      assert(stageOfSorted.sameElements(stageOfSorted.sorted), s"$label: stages not monotone")
      (1 until stages).foreach { k =>
        val through = out.count(_._3 <= k)
        assert(through >= math.ceil(k.toDouble * n / stages).toInt,
          s"$label: cumulative through stage $k short ($through)")
      }
    }
  }
}
