package graft

import org.apache.spark.sql.functions._

import graft.queries.Training

/** Value-level checks for the cross-split contamination audit (q82) and its
  * hashed 100 TB twin (q83): known-fixture semantics, and row-identity of
  * the twin to the oracle-checked string form on the testdata corpora.
  */
class SplitContamSpec extends SparkSpec {

  private val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  test("splitOf deals deterministic 80/10/10 buckets consistent with q49") {
    import spark.implicits._
    val got = spark.range(0, 1000).toDF("doc_id")
      .select(Training.splitOf(col("doc_id")).as("split"))
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // deterministic function of doc_id — exact counts, not approximations
    assert(got.values.sum == 1000L)
    assert(got("train") > 700 && got("train") < 900, s"train share off: $got")
    assert(got.keySet == Set("train", "val", "test"))
    // re-deal must be identical (no rand() anywhere in the path)
    val again = spark.range(0, 1000).toDF("doc_id")
      .select(Training.splitOf(col("doc_id")).as("split"))
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == got)
  }

  test("splitContam finds a planted train->eval near-dup leak, exact counts") {
    import spark.implicits._
    // doc_id 0 deals to train, doc_id 3 to val, doc_id 13 to test (splitOf
    // is deterministic, asserted below). Doc 3 copies a 6-token span of doc
    // 0 (two shared 5-gram windows); doc 13 shares nothing.
    val splits = spark.range(0, 20).toDF("doc_id")
      .select(col("doc_id"), Training.splitOf(col("doc_id")).as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(splits(0L) == "train" && splits(3L) == "val" && splits(13L) == "test")

    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (3L, "prefix quick brown fox jumps over tail"),
      (13L, "completely different words in this one here")
    ).toDF("doc_id", "text")

    val rows = Training.splitContam(docs).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // doc 3: 7 tokens -> 3 windows, of which exactly one ("quick brown fox
    // jumps over") occurs among doc 0's 5 windows; doc 13: 3 windows, 0 hits
    assert(rows(3L) == (("val", 3L, 1L)), s"got ${rows(3L)}")
    assert(rows(13L) == (("test", 3L, 0L)), s"got ${rows(13L)}")
    assert(!rows.contains(0L), "train docs must not appear in the audit")
  }

  test("hashed twin (q83) matches the string form (q82) row for row") {
    // the promised 100 TB swap: chained-XXH64 window keys must reproduce
    // the oracle-checked q82 numbers exactly (n_win AND n_hit — a hash
    // collision or a fallback-semantics mismatch would break either)
    for (d <- dirs) {
      val strForm = SparkEntry.queries("q82_split_contam")(spark, d).collect()
        .map(r => (r.getLong(0), (r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
        .toMap
      val hashForm = SparkEntry.queries("q83_split_contam_hashed")(spark, d).collect()
        .map(r => (r.getLong(0), (r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
        .toMap
      assert(hashForm == strForm, s"$d: hashed and string contamination stats diverge")
    }
  }

  test("contamination is nonzero on the testdata corpus (the audit has signal)") {
    val rows = SparkEntry.queries("q82_split_contam")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    assert(rows.exists(_.getLong(3) > 0L),
      "expected at least one eval doc sharing 5-grams with train (near-dups cross the split)")
  }
}
