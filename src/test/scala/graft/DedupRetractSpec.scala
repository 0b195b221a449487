package graft

import org.apache.spark.sql.functions._

import graft.queries.{Dedup, DedupStore, Tables}

/** The un-absorb contract (q149): retracting an absorbed batch must
  * restore the dedup store — files AND semantics — to its pre-absorb
  * state, including the case a naive row-delete gets wrong: a batch doc
  * that BRIDGED two pre-existing clusters must split them back apart.
  */
class DedupRetractSpec extends SparkSpec {

  test("a batch doc that bridged two clusters splits them back on retract") {
    import spark.implicits._
    // shared-core geometry: A = core + 10 unique, B = core + 10 other
    // unique, bridge = the bare core. j(bridge, A) = 28/38 ≈ 0.74 ≥ 0.7
    // (the core's 28 shingles all appear in A, whose prefix is the core),
    // j(A, B) = 28/52 ≈ 0.54 < 0.7 — so {A, A'} and {B, B'} are separate
    // clusters that ONLY the bridge doc connects
    val core = (1 to 30).map(i => s"core$i").mkString(" ")
    val aText = core + " " + (1 to 10).map(i => s"alpha$i").mkString(" ")
    val bText = core + " " + (1 to 10).map(i => s"beta$i").mkString(" ")
    val thr = 0.7
    def df(rows: Seq[(Long, String)]) = rows
      .map { case (id, t) => (id, t, t.length.toLong) }
      .toDF("doc_id", "text", "n_chars")
    val day0 = df(Seq(1L -> aText, 2L -> aText, 11L -> bText, 12L -> bText))
    val batch = df(Seq(99L -> core))

    val root = java.nio.file.Files
      .createTempDirectory("graft_retract_bridge").toString + "/idx"
    DedupStore.persistBandIndex(day0, root)
    DedupStore.persistComponents(day0, root, thr)
    DedupStore.persistExactIndex(day0, root)
    def manifest() = spark.read.parquet(s"$root/manifest_bp${math.round(thr * 10000)}")
      .select("doc_id", "component").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    val before = manifest()
    assert(before == Map(1L -> 1L, 2L -> 1L, 11L -> 11L, 12L -> 11L),
      s"pre-absorb clusters wrong: $before")

    DedupStore.absorbBatch(spark, batch, day0.unionByName(batch), root, thr)
    DedupStore.appendToExactIndex(spark, batch, root)
    val merged = manifest()
    assert(merged.values.toSet.size == 1 && merged.size == 5,
      s"the bridge doc must merge everything into one cluster: $merged")

    DedupStore.retractBatch(spark, batch.select("doc_id"), day0, root, thr)
    val after = manifest()
    assert(after == before,
      s"retract must split the bridged clusters back: $after vs $before")
  }

  test("retract(absorb(batch)) restores every store artifact row-for-row") {
    // real-corpus round trip with derived cross-day duplicates (the
    // LifecycleSpec derivation): absorb day-1 into the day-0 store, then
    // retract it — bands, shingles, exact index and manifest must all
    // equal their pre-absorb content exactly
    val thr = 0.7
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text", "n_chars")
    val day0 = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val day1 = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
      .unionByName(day0.filter(pmod(col("doc_id"), lit(7)) === 0)
        .select((col("doc_id") + lit(100000L)).as("doc_id"),
          col("text"), col("n_chars")))

    val root = java.nio.file.Files
      .createTempDirectory("graft_retract_rt").toString + "/idx"
    DedupStore.persistBandIndex(day0, root)
    DedupStore.persistComponents(day0, root, thr)
    DedupStore.persistExactIndex(day0, root)
    def rows(sub: String) = spark.read.parquet(s"$root/$sub")
      .collect().map(_.toSeq).toSet
    val parts = Seq("bands", "shingles", "exact_fp", "manifest_bp7000")
    val before = parts.map(p => p -> rows(p)).toMap

    DedupStore.absorbBatch(spark, day1, day0.unionByName(day1), root, thr)
    DedupStore.appendToExactIndex(spark, day1, root)
    assert(rows("bands") != before("bands"), "absorb must change the store")

    DedupStore.retractBatch(spark, day1.select("doc_id"), day0, root, thr)
    for (p <- parts)
      assert(rows(p) == before(p), s"$p not restored by retraction")
  }
}
