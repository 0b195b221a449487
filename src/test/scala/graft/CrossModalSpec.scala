package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.queries.{Dedup, Extras, Tables}

/** Cross-modal duplicate families (q191): the component assignment must
  * equal a direct union-find over the three per-modality pair sets, and
  * must merge docs whose TEXT is unrelated through their media edges —
  * the case no single-modality dedup can see.
  */
class CrossModalSpec extends SparkSpec {

  test("q191 equals a direct union-find over the union graph; image families merge text-unrelated docs") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).toSet

    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("a").cast("long"), col("b").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val text = pairs(Dedup.minhashPairs(docs, 0.7))
    val img = pairs(Multimodal.dhashPairs(Multimodal.imagePayloads(docs), 8))
    val aud = pairs(Multimodal.audioPairs(Multimodal.audioPayloads(docs), 4))

    // reference: plain union-find over the collected union graph
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i).toSeq: _*)
    def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (text ++ img ++ aud).foreach { case (a, b) => union(a, b) }
    val want = ids.map(i => (find(i), i))

    val got = Extras.crossModalComponents(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want,
      s"missing=${(want -- got).take(5)} spurious=${(got -- want).take(5)}")

    // the load-bearing semantic: an image family whose members share NO
    // text edge still folds into one component (imagePayloads variants
    // 0/1/2 of family f share a pattern; the fixture text is word soup)
    val mediaOnly = img.filter { case (a, b) =>
      find(a) == find(b) && !text.contains((a, b)) && !text.contains((b, a))
    }
    assert(mediaOnly.nonEmpty, "fixture must exercise media-only merges")
    val compOf = got.map { case (c, d) => d -> c }.toMap
    mediaOnly.foreach { case (a, b) =>
      assert(compOf(a) == compOf(b),
        s"image edge ($a,$b) must merge despite unrelated text")
    }
  }
}
