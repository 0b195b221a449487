package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.{Curation, Tables}

/** The refcounted window store's retraction contract (q150): the
  * un-absorb for the one store family q149 had to document as
  * irreversible under the DISTINCT layout. Pins the cases the gauge's
  * oracle cannot see — the (g, net count) table itself: shared windows
  * must DECREMENT and survive where a naive row-delete would kill them,
  * batch-only windows must vanish, the counted (non-idempotent) absorb
  * semantics must hold, and compaction must be value-invisible.
  */
class RefcountStoreSpec extends SparkSpec {

  private def docsDf(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.map { case (id, t) => (id, t, "s0") }.toDF("doc_id", "text", "source")
  }

  /** Net (g -> count) view of a store, collapsing absorb delta rows. */
  private def net(path: String): Map[String, Long] =
    spark.read.parquet(path).groupBy("g").agg(sum("rc").as("rc"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString + "/store"

  test("shared windows decrement and survive retraction; batch-only windows vanish") {
    // base doc carries windows {w1..w5, w2..w6}; the batch doc SHARES
    // w1..w5 and adds one window of its own — the geometry where a
    // row-delete retraction (drop the batch's windows) is wrong
    val base = docsDf(Seq(1L -> "w1 w2 w3 w4 w5 w6"))
    val batch = docsDf(Seq(99L -> "w1 w2 w3 w4 w5 z1"))
    val path = tmp("graft_rc_shared")
    Curation.refcountedWindowStore(base).write.parquet(path)
    val before = net(path)
    assert(before == Map("w1 w2 w3 w4 w5" -> 1L, "w2 w3 w4 w5 w6" -> 1L))

    Curation.absorbIntoRefcountedStore(spark, batch, path)
    assert(net(path) == Map(
      "w1 w2 w3 w4 w5" -> 2L, "w2 w3 w4 w5 w6" -> 1L, "w2 w3 w4 w5 z1" -> 1L))

    Curation.retractFromRefcountedStore(spark, batch, path)
    assert(net(path) == before,
      "retract must restore the exact pre-absorb (g, rc) table")
  }

  test("absorbs are counted: double absorb needs double retract") {
    val base = docsDf(Seq(1L -> "w1 w2 w3 w4 w5 w6"))
    val batch = docsDf(Seq(99L -> "w1 w2 w3 w4 w5 z1"))
    val path = tmp("graft_rc_counted")
    Curation.refcountedWindowStore(base).write.parquet(path)
    Curation.absorbIntoRefcountedStore(spark, batch, path)
    Curation.absorbIntoRefcountedStore(spark, batch, path)
    Curation.retractFromRefcountedStore(spark, batch, path)
    // one retract cancels ONE absorb — the batch's windows must still be
    // present (this is where a DISTINCT store's idempotent view and the
    // counted view genuinely differ)
    assert(net(path) == Map(
      "w1 w2 w3 w4 w5" -> 2L, "w2 w3 w4 w5 w6" -> 1L, "w2 w3 w4 w5 z1" -> 1L))
    Curation.retractFromRefcountedStore(spark, batch, path)
    assert(net(path) == Map("w1 w2 w3 w4 w5" -> 1L, "w2 w3 w4 w5 w6" -> 1L))
  }

  test("the hashed twin's net counts are the string store's, keyed by xxhash64") {
    // q156 ≡ q150 with g -> xxhash64(g): the two lifecycle stores must be
    // in exact count bijection (no collisions on this corpus — the same
    // check q133 rests on)
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val str = Curation.refcountedWindowStore(docs)
      .select(xxhash64(col("g")).as("g"), col("rc"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hashed = Curation.hashedRefcountedWindowStore(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashed == str,
      "hashed refcounted store must be the string store under xxhash64")
  }

  test("q150 lifecycle on the corpus: absorb-absorb-retract equals one-shot rebuild") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val path = tmp("graft_rc_corpus")
    Curation.refcountedWindowStore(docs.filter(pmod(col("doc_id"), lit(5)) > 1))
      .write.parquet(path)
    Curation.absorbIntoRefcountedStore(
      spark, docs.filter(pmod(col("doc_id"), lit(5)) === 1), path)
    val flagged = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
    Curation.absorbIntoRefcountedStore(spark, flagged, path)
    Curation.retractFromRefcountedStore(spark, flagged, path)

    val rebuilt = Curation
      .refcountedWindowStore(docs.filter(pmod(col("doc_id"), lit(5)) =!= 0))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(net(path) == rebuilt,
      "retracted store must equal the from-scratch rebuild, counts included")

    // the gauge consequence: novelty against the lifecycle store equals
    // novelty against the DISTINCT rebuild store (what q150's oracle
    // replays), row for row
    val viaLifecycle = Curation.contentNovelty(spark.read.parquet(path), flagged)
      .collect().map(_.toSeq).toSeq
    val viaRebuild = Curation.contentNovelty(
      Curation.windowStore(docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)), flagged)
      .collect().map(_.toSeq).toSeq
    assert(viaLifecycle == viaRebuild)

    // compaction is value-invisible: same net table, one row per window
    Curation.compactRefcountedStore(spark, path)
    val compacted = spark.read.parquet(path)
    assert(compacted.count() == rebuilt.size,
      "compaction must leave exactly one row per window")
    assert(net(path) == rebuilt)
  }

  test("onceId retracts are exactly-once: same-id re-runs no-op, the witness survives rewrites") {
    val base = docsDf(Seq(1L -> "w1 w2 w3 w4 w5 w6"))
    val batch = docsDf(Seq(99L -> "w1 w2 w3 w4 w5 z1"))
    val path = tmp("graft_rc_once")
    Curation.refcountedWindowStore(base).write.parquet(path)
    Curation.absorbIntoRefcountedStore(spark, batch, path)
    Curation.retractFromRefcountedStore(spark, batch, path, onceId = Some("forget-1"))
    val after = net(path)
    assert(after == Map("w1 w2 w3 w4 w5" -> 1L, "w2 w3 w4 w5 w6" -> 1L))

    // the double retract that used to corrupt silently (q150's documented
    // violation) is now a no-op: the witness marker skips the subtract
    Curation.retractFromRefcountedStore(spark, batch, path, onceId = Some("forget-1"))
    assert(net(path) == after, "a re-run bearing the same onceId must change nothing")

    // the witness is part of the store, not the session: it survives a
    // compaction rewrite (markers are swap-carried) and still skips
    Curation.compactRefcountedStore(spark, path)
    Curation.retractFromRefcountedStore(spark, batch, path, onceId = Some("forget-1"))
    assert(net(path) == after, "the witness must survive store rewrites")

    // a DIFFERENT forget id is a different order and applies normally
    Curation.absorbIntoRefcountedStore(spark, batch, path)
    Curation.retractFromRefcountedStore(spark, batch, path, onceId = Some("forget-2"))
    assert(net(path) == after, "a fresh onceId must subtract once, exactly")
  }
}
