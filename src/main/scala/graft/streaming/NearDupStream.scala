package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.functions.{HashExpressions, Text}

/** Streaming NEAR-duplicate filtering — the streaming twin of the batch
  * MinHash+LSH dedup (q33): a document stream where any document that
  * collides with an earlier-seen document in at least one LSH band within
  * the watermark horizon is suppressed.
  *
  * Shape: two CHAINED stateful operators (Spark supports multiple stateful
  * ops per query in append mode since 3.4):
  *   1. explode each doc into its `numBands` (band, bhash) keys and run
  *      `dropDuplicatesWithinWatermark` on the band key — the first doc to
  *      claim a band keeps it, later claimants' rows are dropped; band
  *      state evicts at the watermark exactly like [[DedupStream]];
  *   2. a watermarked tumbling-window count per doc — a doc survives iff
  *      it won ALL of its bands (count == numBands), i.e. no band collided
  *      with anything earlier.
  *
  * Semantics note (documented, inherent to band-claiming): two near-dups
  * in the SAME micro-batch race for their shared bands; the loser is
  * always suppressed, and if each wins some bands BOTH can be suppressed —
  * at-most-one-of-a-dup-set survives, occasionally zero under same-batch
  * ties. Exact same-text duplicates collide on EVERY band, so the later
  * one is always fully suppressed. State for both operators is bounded by
  * rate x (watermark + window), never by corpus size.
  *
  * FALSE-SUPPRESSION bound (unlike batch q33, there is no Jaccard
  * verification after the band match — a single chance band collision
  * with an UNRELATED earlier doc suppresses): for a novel doc against one
  * prior doc of Jaccard similarity s, P(some band agrees) ≤
  * numBands · s^rowsPerBand, so against everything inside the state
  * horizon the union bound is
  *   P(false suppression) ≤ numBands · n_horizon · s̄^rowsPerBand,
  * where n_horizon is the doc count within (watermark + window) — NOT the
  * full stream, since claimed bands evict with the watermark — and s̄ the
  * background (unrelated-pair) Jaccard. Defaults (8 bands, r = 4):
  * s̄ = 0.05 ⇒ ~5·10⁻⁵ per horizon-doc — fine at thousands of docs per
  * horizon, material at millions. The knobs, in order: raise rowsPerBand
  * (steepens s^r fastest), shorten the watermark, or treat this stream as
  * candidate REMOVAL and re-verify suppressed docs offline with the batch
  * q33 shingle-Jaccard path (the streaming state never holds prior text,
  * so in-stream verification would need a second corpus-sized state — the
  * wrong trade at scale).
  */
object NearDupStream {

  /** Emitted rows: (window_start, doc_id) for documents that won all their
    * bands — i.e. no near-dup predecessor within the watermark horizon.
    * Rows appear when the watermark finalizes their window.
    */
  def distinctDocs(
      docs: DataFrame,
      tsCol: String = "ts",
      idCol: String = "doc_id",
      textCol: String = "text",
      numPerm: Int = 32,
      numBands: Int = 8,
      rowsPerBand: Int = 4,
      windowLength: String = "1 minute",
      watermarkDelay: String = "10 minutes"): DataFrame = {
    require(numPerm >= numBands * rowsPerBand,
      s"banding reads $numBands*$rowsPerBand signature entries but the " +
        s"minhash signature has only $numPerm — raise numPerm or shrink the bands")
    val banded = docs
      .withWatermark(tsCol, watermarkDelay)
      .select(
        col(idCol), col(tsCol),
        explode(Text.lshBands(
          HashExpressions.shingleMinHash(Text.tokens(col(textCol)), k = 3, numPerm = numPerm),
          numBands = numBands, rowsPerBand = rowsPerBand)).as("b"))
      .select(col(idCol), col(tsCol), col("b.band").as("band"), col("b.bhash").as("bhash"))
    banded
      .dropDuplicatesWithinWatermark("band", "bhash")
      .groupBy(window(col(tsCol), windowLength), col(idCol))
      .agg(count(lit(1)).as("n_bands_won"))
      .filter(col("n_bands_won") === numBands)
      .select(col("window.start").as("window_start"), col(idCol))
  }

  def start(
      src: DataFrame,
      queryName: String = "neardup_distinct",
      tsCol: String = "ts",
      idCol: String = "doc_id",
      textCol: String = "text",
      watermarkDelay: String = "10 minutes",
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    distinctDocs(src, tsCol = tsCol, idCol = idCol, textCol = textCol,
        watermarkDelay = watermarkDelay)
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("append")
      .trigger(trigger)
      .start()
}
