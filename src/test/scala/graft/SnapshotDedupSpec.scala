package graft

import org.apache.spark.sql.functions._

import graft.queries.{Dedup, DedupStore, Tables}

/** The q146 scale contract: folding snapshots one at a time through the
  * persisted band-index/component store (the q110 contracted merge on gid
  * keys — O(snapshot) per fold) must produce the SAME families and the
  * SAME keep-newest survivors as the one-shot union clustering the oracle
  * replays. This is the production path at 100 TB — a new crawl absorbs
  * into the standing store, the union is never re-clustered — so the pin
  * is what licenses the one-shot oracle to certify it.
  */
class SnapshotDedupSpec extends SparkSpec {

  test("snapshot-by-snapshot fold through the persisted store equals the one-shot union clustering") {
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val snaps = DedupStore.deriveSnapshots(Tables(spark, d, "documents"))
      val oneShot = DedupStore.crossSnapshotDedup(snaps).collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> (r.getLong(2), r.getInt(3)))
        .toMap

      val keyed = DedupStore.withSnapGid(snaps)
        .select(col("gid"), col("snap"), col("doc_id"),
          col("text"), length(col("text")).cast("long").as("n_chars"))
      def snapDocs(n: Int) = keyed.filter(col("snap") === n)
        .select(col("gid").as("doc_id"), col("text"), col("n_chars"))
      val path = java.nio.file.Files
        .createTempDirectory("graft_snapfold").toString + "/idx"
      DedupStore.persistBandIndex(snapDocs(0), path)
      DedupStore.persistComponents(snapDocs(0), path, threshold = 0.7)
      var corpus = snapDocs(0)
      for (n <- 1 to 2) {
        val next = corpus.unionByName(snapDocs(n))
        DedupStore.absorbBatch(spark, snapDocs(n), next, path, threshold = 0.7)
        corpus = next
      }
      val stored = spark.read.parquet(s"$path/manifest_bp7000")
        .select(col("doc_id").as("id"), col("component"))
      val folded = DedupStore.keepNewest(keyed, stored).collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> (r.getLong(2), r.getInt(3)))
        .toMap
      assert(folded == oneShot,
        s"$d: snapshot fold diverges from the one-shot union clustering")
      assert(oneShot.count(_._2._2 == 1) < oneShot.size,
        s"$d: the derived snapshots must produce multi-member families")
    }
  }

  test("q158: retracting snapshot 2 from the absorbed store equals the snapshots-0/1 one-shot") {
    val d = "/root/testdata/sf0.001"
    val viaRetract = SparkEntry.queries("q158_snapshot_retract")(spark, d)
      .collect().map(_.toSeq).toSeq
    val oneShot01 = DedupStore.crossSnapshotDedup(
      DedupStore.deriveSnapshots(Tables(spark, d, "documents"))
        .filter(col("snap") < 2))
      .collect().map(_.toSeq).toSeq
    assert(viaRetract == oneShot01,
      "snapshot retraction must restore exactly the snapshots-0/1 clustering")
  }

  test("keep-newest prefers the freshest snapshot, then n_chars, then gid") {
    import spark.implicits._
    // one family of three versions across two snapshots (identical text ⇒
    // one banded family), one singleton; the snap-1 member must win even
    // though the snap-0 copy has the same length and a smaller gid
    val snaps = Seq(
      (0, 1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (0, 2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (1, 1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (1, 9L, "wholly unrelated content words here nothing shared")
    ).toDF("snap", "doc_id", "text")
    val out = DedupStore.crossSnapshotDedup(snaps).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getInt(3)).toMap
    assert(out((1, 1L)) == 1, "the snap-1 re-crawl must be the survivor")
    assert(out((0, 1L)) == 0 && out((0, 2L)) == 0,
      "older versions and their near-dups must be dropped")
    assert(out((1, 9L)) == 1, "a singleton keeps itself")
  }

  test("withSnapGid raises on ids outside the stride range") {
    import spark.implicits._
    val bad = Seq((0, DedupStore.SnapStride, "x")).toDF("snap", "doc_id", "text")
    val e = intercept[Exception] {
      DedupStore.withSnapGid(bad).collect()
    }
    assert(e.getMessage.contains("snap gid out of range") ||
      Option(e.getCause).exists(_.getMessage.contains("snap gid out of range")))
  }
}
