package graft

/** Value checks for the within-doc repetition rewrite (q85). */
class TextRewriteSpec extends SparkSpec {

  test("q85 collapses runs to their first token, exact fixture") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val ts = split(col("text"), " ", -1)
    val keep = filter(ts, (x, i) => i === 0 || element_at(ts, i) =!= x)
    val got = Seq(
      (1L, "a a b a c c c"),
      (2L, "x"),
      (3L, "y y y y")
    ).toDF("doc_id", "text")
      .select(col("doc_id"), concat_ws(" ", keep).as("clean"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "a b a c", 2L -> "x", 3L -> "y"), s"got $got")
  }

  test("q85 output has no adjacent duplicates and is idempotent on real docs") {
    val rows = SparkEntry.queries("q85_collapse_repeats")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    var changed = 0
    rows.foreach { r =>
      val (nb, na, clean) = (r.getLong(1), r.getLong(2), r.getString(3))
      val toks = clean.split(" ", -1)
      assert(toks.length == na, s"doc ${r.getLong(0)}: n_after disagrees with text")
      // no run survives → a second pass must be the identity
      toks.sliding(2).foreach { w =>
        if (w.length == 2) assert(w(0) != w(1),
          s"doc ${r.getLong(0)}: adjacent duplicate '${w(0)}' survived")
      }
      if (nb != na) changed += 1
    }
    assert(changed > 0, "the corpus is known to contain adjacent repeats")
  }
}
