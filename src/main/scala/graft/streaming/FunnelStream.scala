package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}

/** Stateful streaming funnel — the online twin of the batch funnel
  * (`q151_funnel`): per-user view → click → purchase progression with
  * each step inside the horizon of the step before it, emitted as
  * conversion telemetry the moment a user ADVANCES (not a per-event
  * firehose — a micro-batch that moves nobody emits nothing).
  *
  * Design for scale: state is TWO fields per user (awaited step index +
  * previous-step micros — constant, smaller than sessionization's open
  * session), hash-partitioned by user across executors. No timeout: a
  * funnel never closes on silence, so state is bounded by distinct
  * users, and an idle user costs 12 bytes, not a timer.
  *
  * Stream ≡ batch contract (FunnelStreamSpec): the batch fold is a left
  * fold over each user's (ts, step-rank)-sorted events; the online step
  * sorts WITHIN each micro-batch by the same key (q151's tie rule) and
  * carries the fold state across batches — so when batches arrive in
  * per-user event-time order (the ordered-feed discipline the daily-ops
  * streams' frozen-artifact contract is the batch-side analogue of),
  * the final per-user position equals the batch fold exactly: it is the
  * same fold, merely split at batch boundaries. Events arriving late
  * ACROSS batches cannot rewind an advance — progression is monotone by
  * construction, which is the correct online behavior (a conversion
  * already reported must not un-happen) even when it diverges from a
  * from-scratch re-sort.
  */
object FunnelStream {

  case class Event(user_id: Long, ts: Timestamp, event_type: String)

  /** The fold state: `s` = steps completed (the awaited step's rank),
    * `tp` = micros of the event that completed step `s`.
    */
  case class FState(s: Int, tp: Long)

  case class Progress(user_id: Long, steps_completed: Int)

  /** Epoch micros of a Timestamp (`getTime` alone truncates to millis —
    * the SessionizeStream precision note applies verbatim: a microsecond
    * tie at a horizon boundary must agree with the batch twin).
    */
  private def microsOf(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  /** Advance one user's funnel over a micro-batch of their events:
    * sort by (tu, step-rank) — q151's exact comparator, same-microsecond
    * events advance in step order — then run the q151 fold from the
    * carried state.
    */
  private def step(ranks: Map[String, Int], horizonUs: Long)(
      userId: Long,
      events: Iterator[Event],
      state: GroupState[FState]): Iterator[Progress] = {
    val sorted = events
      .flatMap(e => ranks.get(e.event_type).map(i => (microsOf(e.ts), i)))
      .toArray.sorted
    var st = state.getOption.getOrElse(FState(0, 0L))
    val before = st.s
    for ((tu, idx) <- sorted)
      if (idx == st.s && (st.s == 0 || tu <= st.tp + horizonUs))
        st = FState(st.s + 1, tu)
    if (st.s != before) {
      state.update(st)
      Iterator.single(Progress(userId, st.s))
    } else Iterator.empty
  }

  /** Funnel a (streaming) events frame with columns
    * `user_id: long, ts: timestamp, event_type: string`.
    */
  def funnel(
      events: DataFrame,
      steps: Seq[String] = Seq("view", "click", "purchase"),
      horizonUs: Long = 72L * 3600L * 1000000L): Dataset[Progress] = {
    implicit val evEnc: Encoder[Event] = Encoders.product[Event]
    implicit val stEnc: Encoder[FState] = Encoders.product[FState]
    implicit val outEnc: Encoder[Progress] = Encoders.product[Progress]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    val ranks = steps.zipWithIndex.toMap
    events
      .selectExpr("user_id", "ts", "event_type")
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Update(), GroupStateTimeout.NoTimeout())(step(ranks, horizonUs))
  }

  /** Stream per-user funnel advances to an in-memory table (tests) —
    * update mode: each row is a user reaching a new step.
    */
  def start(
      spark: SparkSession,
      src: DataFrame,
      queryName: String = "funnel",
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    funnel(src)
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("update")
      .trigger(trigger)
      .start()
}
