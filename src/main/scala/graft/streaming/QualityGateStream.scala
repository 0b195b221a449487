package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming quality gate — the online form of the batch adaptive filter
  * (q115): per-source thresholds are SOLVED OFFLINE over yesterday's
  * corpus ([[graft.queries.Curation.adaptiveQualityFilter]]'s histogram
  * rule) and APPLIED to the ingest feed as a stateless codegen filter.
  *
  * This split — batch solve, stream apply — is the production contract
  * for every distribution-derived knob (thresholds, mixture rates, bloom
  * filters): a threshold must NOT drift within a day as the stream's
  * observed distribution shifts, or two replicas of the gate would admit
  * different documents for the same input (and a replayed partition would
  * gate differently than the original run). The stream therefore treats
  * the thresholds as a STATIC broadcast side, exactly like
  * [[ContamGuardStream]]'s train-window index; re-solving is a scheduled
  * batch job that swaps the artifact between days.
  *
  * Plan shape: the score is the same integer per-mille density expression
  * as q115 (pure codegen, no state), the threshold join is stream-static
  * against a sources-sized table (broadcast — kilobytes), and the gate is
  * `score >= thr`. No watermark, no state store, no shuffle: each
  * micro-batch is a map-only pass, which is what an ingest-rate-bound
  * gate needs at 100 TB/day.
  *
  * Docs from sources with NO solved threshold (first day a source
  * appears) pass with `thr` null and `keep = 1` — the permissive default
  * is deliberate: quality filtering is a yield decision, and silently
  * dropping a new source's entire first day is the worse failure. The
  * `thr IS NULL` rows are the signal to re-solve.
  */
object QualityGateStream {

  /** Gate `docs` (streaming; needs `doc_id`, `source`, `text`) against
    * static per-source `thresholds` (source, thr — q115's solve output).
    * Emits every doc with (doc_id, source, score, thr, keep).
    *
    * `thresholds` must be a MATERIALIZED artifact (parquet-backed) — not
    * the live [[graft.queries.Curation.adaptiveQualityFilter]] plan: a
    * live solve would recompute per micro-batch, so a day's gate could
    * drift with the arriving distribution — the exact failure this
    * batch-solve/stream-apply split exists to prevent. StreamingSpec pins
    * the parquet-backed handoff.
    */
  def gate(docs: DataFrame, thresholds: DataFrame): DataFrame = {
    val t = col("text")
    docs
      .filter(length(t) > 0)
      .select(col("doc_id"), col("source"),
        floor(lit(1000.0) * length(replace(t, lit(" "), lit(""))) / length(t))
          .as("score"))
      // no explicit broadcast() hint needed: the sources-sized static
      // side broadcasts by size estimation in every micro-batch plan
      .join(thresholds.select(col("source"), col("thr")), Seq("source"), "left")
      .select(col("doc_id"), col("source"), col("score"), col("thr"),
        when(col("thr").isNull || col("score") >= col("thr"), 1)
          .otherwise(0).as("keep"))
  }

  def start(
      docs: DataFrame,
      thresholds: DataFrame,
      queryName: String = "quality_gate",
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    gate(docs, thresholds)
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("append")
      .trigger(trigger)
      .start()
}
