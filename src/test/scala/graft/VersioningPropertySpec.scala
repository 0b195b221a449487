package graft

import scala.util.Random

import org.apache.spark.sql.functions._

/** Property coverage for the snapshot-versioning pair (q132 diff / q140
  * apply) and the session-gap sweep (q138) across random inputs — the
  * invariants the fixed oracle corpora can't cover:
  *
  *   1. diff/apply round-trip: for ANY random edit script (deletes,
  *      in-place rewrites, inserts), applying the script to v0 then
  *      diffing against the directly-edited v1 reports all-unchanged;
  *   2. diff conservation: per source, unchanged + changed + removed =
  *      |v0| and unchanged + changed + added = |v1|;
  *   3. gap-sweep monotonicity: the session count is non-increasing in
  *      the gap threshold, and n_users ≤ n_sessions ≤ n_events at every
  *      grid point, for random event streams.
  *
  * Seeded `Random` (reproducible, offline-cache-safe).
  */
object VersioningPropertySpec {
  case class Doc(doc_id: Long, source: String, text: String)
}

class VersioningPropertySpec extends SparkSpec {

  import VersioningPropertySpec.Doc
  import spark.implicits._

  private def corpus(rnd: Random, n: Int): Seq[Doc] =
    (0 until n).map { id =>
      Doc(id.toLong, s"s${rnd.nextInt(3)}",
        Seq.fill(3 + rnd.nextInt(10))(s"w${rnd.nextInt(50)}").mkString(" "))
    }

  test("random edit scripts: apply round-trips and diff counts conserve") {
    val rnd = new Random(4242L)
    for (trial <- 1 to 6) {
      val v0rows = corpus(rnd, 40 + rnd.nextInt(80))
      // random script: each doc independently kept / rewritten / deleted,
      // plus a batch of brand-new docs
      val dels = v0rows.filter(_ => rnd.nextDouble() < 0.15)
      val delIds = dels.map(_.doc_id).toSet
      val rewrites = v0rows.filterNot(d => delIds(d.doc_id))
        .filter(_ => rnd.nextDouble() < 0.2)
        .map(d => d.copy(text = d.text + " edited" + rnd.nextInt(10)))
      val inserts = (0 until 1 + rnd.nextInt(15)).map { i =>
        Doc(100000L + trial * 1000 + i, s"s${rnd.nextInt(3)}", s"new doc $trial $i")
      }
      val v0 = v0rows.toDF()
      val rewriteIds = rewrites.map(_.doc_id).toSet
      val v1rows = v0rows.filterNot(d => delIds(d.doc_id))
        .map(d => rewrites.find(_.doc_id == d.doc_id).getOrElse(d)) ++ inserts
      val v1 = v1rows.toDF()

      // 1. apply(script, v0) == v1 — via the diff gauge itself
      val feed =
        dels.map(d => (d.doc_id, d.source, d.text, "delete")) ++
        (rewrites ++ inserts).map(d => (d.doc_id, d.source, d.text, "upsert"))
      val applied = graft.queries.Curation.applyChanges(
        v0, feed.toDF("doc_id", "source", "text", "op"))
      val rt = graft.queries.Curation.snapshotDiff(applied, v1).collect()
      assert(rt.forall(r => r.getLong(2) == 0 && r.getLong(3) == 0 && r.getLong(4) == 0),
        s"trial $trial: apply(script) must land exactly on v1")

      // 2. diff conservation per source
      val diff = graft.queries.Curation.snapshotDiff(v0, v1).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toMap
      val n0 = v0rows.groupBy(_.source).view.mapValues(_.size.toLong).toMap
      val n1 = v1rows.groupBy(_.source).view.mapValues(_.size.toLong).toMap
      diff.foreach { case (src, (u, c, r, a)) =>
        assert(u + c + r == n0.getOrElse(src, 0L), s"trial $trial $src: v0 not conserved")
        assert(u + c + a == n1.getOrElse(src, 0L), s"trial $trial $src: v1 not conserved")
      }
    }
  }

  test("gap sweep: sessions monotone in the threshold, user/event bounds hold") {
    val rnd = new Random(99L)
    for (trial <- 1 to 5) {
      val base = 1700000000000L
      val events = (0 until 30 + rnd.nextInt(40)).flatMap { u =>
        var t = base + rnd.nextInt(1000) * 60000L
        (0 until 1 + rnd.nextInt(12)).map { i =>
          t += rnd.nextInt(200) * 60000L // gaps 0..200 min
          (u * 1000L + i, u.toLong, new java.sql.Timestamp(t))
        }
      }.toDF("event_id", "user_id", "ts")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      val out = events
        .select(col("user_id"),
          (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)).as("gap_us"))
        .select(col("user_id"), col("gap_us"),
          explode(array(Seq(5L, 30L, 60L, 120L).map(lit): _*)).as("gap_min"))
        .groupBy("gap_min")
        .agg(
          countDistinct(col("user_id")).as("n_users"),
          sum(when(col("gap_us").isNull ||
            col("gap_us") > col("gap_min") * lit(60000000L), 1L).otherwise(0L))
            .as("n_sessions"),
          count(lit(1)).as("n_events"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1)
      out.foreach { case (g, users, sessions, evs) =>
        assert(users <= sessions && sessions <= evs,
          s"trial $trial gap=$g: bounds violated ($users/$sessions/$evs)")
      }
      out.sliding(2).foreach { case Array((_, _, s0, _), (g1, _, s1, _)) =>
        assert(s1 <= s0, s"trial $trial: sessions must be non-increasing at gap=$g1")
      }
    }
  }
}
