package graft

import org.apache.spark.sql.Row

/** Planted-fixture checks for [[graft.queries.Dedup.dedupSpanRewrite]]
  * (q86): cross-doc duplicated spans >= minSpan tokens are excised exactly,
  * shorter shared runs and within-doc-only repeats survive, and untouched
  * docs round-trip verbatim.
  */
class SpanRewriteSpec extends SparkSpec {

  import spark.implicits._

  // distinct filler words so no accidental 5-gram crosses docs
  private def words(prefix: String, n: Int): Seq[String] =
    (0 until n).map(i => s"$prefix$i")

  private val span12 = words("dup", 12) // the planted cross-doc span
  private val span8 = words("low", 8) // shared but below minSpan=10

  private val docA = words("aa", 7) ++ span12 ++ words("ab", 6)
  private val docB = words("ba", 5) ++ span12 ++ words("bb", 9)
  private val docC = words("ca", 20) // unrelated
  private val docD = words("da", 6) ++ span8 ++ words("db", 6)
  private val docE = words("ea", 4) ++ span8 ++ words("eb", 7)
  // SPAN2 repeats only within F — cross-doc df of its windows is 1
  private val span2 = words("self", 11)
  private val docF = words("fa", 3) ++ span2 ++ words("fb", 4) ++ span2

  private lazy val result: Map[Long, (Long, Long, String)] = {
    val docs = Seq(
      (0L, docA), (1L, docB), (2L, docC), (3L, docD), (4L, docE), (5L, docF))
      .map { case (id, ts) => (id, ts.mkString(" ")) }
      .toDF("doc_id", "text")
    graft.queries.Dedup.dedupSpanRewrite(docs, k = 5, minSpan = 10)
      .collect()
      .map { case Row(id: Long, ns: Long, nt: Long, ct: String) => id -> ((ns, nt, ct)) }
      .toMap
  }

  test("planted 12-token cross-doc span is excised from both docs, context intact") {
    // coverage of a 12-token shared span with distinct context is exactly
    // the span: windows fully inside it are shared, boundary windows are not
    assert(result(0L) == ((1L, 12L, (words("aa", 7) ++ words("ab", 6)).mkString(" "))))
    assert(result(1L) == ((1L, 12L, (words("ba", 5) ++ words("bb", 9)).mkString(" "))))
  }

  test("8-token shared span is below minSpan and survives") {
    assert(result(3L) == ((0L, 0L, docD.mkString(" "))))
    assert(result(4L) == ((0L, 0L, docE.mkString(" "))))
  }

  test("within-doc-only repeated span is NOT excised (cross-doc df = 1)") {
    assert(result(5L) == ((0L, 0L, docF.mkString(" "))))
  }

  test("unrelated doc round-trips verbatim") {
    assert(result(2L) == ((0L, 0L, docC.mkString(" "))))
  }

  test("fully-duplicated doc pair collapses to empty clean_text") {
    val twin = words("tw", 15).mkString(" ")
    val docs = Seq((0L, twin), (1L, twin), (2L, words("zz", 9).mkString(" ")))
      .toDF("doc_id", "text")
    val r = graft.queries.Dedup.dedupSpanRewrite(docs, k = 5, minSpan = 10)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(r(0L) == ((1L, 15L, "")))
    assert(r(1L) == ((1L, 15L, "")))
    assert(r(2L) == ((0L, 0L, words("zz", 9).mkString(" "))))
  }

  test("docs shorter than k are never rewritten") {
    val short = words("sh", 4).mkString(" ")
    val docs = Seq((0L, short), (1L, short)).toDF("doc_id", "text")
    val r = graft.queries.Dedup.dedupSpanRewrite(docs, k = 5, minSpan = 10)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(r == Map(0L -> short, 1L -> short))
  }
}
