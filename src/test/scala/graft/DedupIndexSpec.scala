package graft

import org.apache.spark.sql.functions._

/** Value-level cross-checks for the dedup paths the DuckDB oracle cannot
  * recompute (hashed kernels, minhash banding): each scale-path form is
  * pinned row-identical to its oracle-checked (or deterministically
  * equivalent) twin on the testdata corpora.
  */
class DedupIndexSpec extends SparkSpec {

  private val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  test("hashed-shingle overlap matrix matches the string-shingle form (q65) row for row") {
    // the promised 100 TB swap: 8-byte hashed shingle keys must produce the
    // SAME source×source shared counts as the oracle-checked string form
    for (d <- dirs) {
      val strForm = SparkEntry.queries("q65_source_overlap")(spark, d).collect()
        .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
      val hashForm = graft.queries.Dedup
        .hashedOverlap(graft.queries.Tables(spark, d, "documents"))
        .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
      assert(hashForm == strForm, s"$d: hashed=$hashForm vs string=$strForm")
    }
  }

  test("incremental band-index dedup equals the whole-corpus pair set restricted to the batch") {
    // q66's contract: probing the persisted index with the new batch finds
    // EXACTLY the (old, new) crossings a full q33-style run over the whole
    // corpus finds — same bands, same verify threshold, no old doc rescanned.
    for (d <- dirs) {
      val docs = graft.queries.Tables(spark, d, "documents")
      val newIds = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val full = graft.queries.Dedup.minhashPairs(docs, threshold = 0.7).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        // exactly one endpoint in the new batch — the crossings q66 can see
        .filter { case (a, b, _) => newIds.contains(a) ^ newIds.contains(b) }
        .map { case (a, b, j) => ((a min b, a max b), j) }.toMap
      val inc = SparkEntry.queries("q66_dedup_incremental")(spark, d).collect()
        .map { r =>
          val (n, e) = (r.getLong(0), r.getLong(1))
          ((n min e, n max e), r.getDouble(2))
        }.toMap
      assert(inc == full, s"$d: incremental=$inc vs restricted-full=$full")
      assert(inc.keySet.forall { case (a, b) =>
        newIds.contains(a) ^ newIds.contains(b) }, "every pair must cross the batch boundary")
    }
  }
}
