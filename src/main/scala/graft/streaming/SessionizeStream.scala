package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}

/** Stateful streaming sessionization — the streaming twin of the batch
  * `q25_sessionize` window query: events are grouped per user and split
  * into sessions whenever the gap between consecutive events exceeds
  * `gapMinutes`; a session is emitted once the event-time watermark passes
  * its close.
  *
  * Design for scale: state is ONE open session per user (constant size —
  * no event buffering: only count + first/last timestamps are held), keyed
  * state is hash-partitioned across executors by user_id, and event-time
  * timeout + watermark bound both state size and late data. This is the
  * `flatMapGroupsWithState` pattern from the Structured Streaming
  * programming guide.
  */
object SessionizeStream {

  case class Event(user_id: Long, event_id: Long, ts: Timestamp)

  case class OpenSession(start: Long, last: Long, n: Long, sessionSeq: Long)

  case class ClosedSession(
      user_id: Long,
      session_seq: Long,
      start: Timestamp,
      end: Timestamp,
      n_events: Long)

  /** Epoch micros of a Timestamp. `getTime` alone truncates to millis
    * (sub-ms digits live in the separate nanos field), which would let the
    * streaming gap test disagree with the batch twin (q25, `unix_micros`)
    * for events within 1 ms of an exact gap boundary.
    */
  private def microsOf(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  /** Split one user's new events against the open-session state. Events are
    * micro-batch-buffered by the engine, so sort within the group; gaps >
    * `gapUs` close the current session.
    */
  private def step(gapUs: Long)(
      userId: Long,
      events: Iterator[Event],
      state: GroupState[OpenSession]): Iterator[ClosedSession] = {

    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      return Iterator(ClosedSession(
        userId, s.sessionSeq,
        new Timestamp(s.start / 1000), new Timestamp(s.last / 1000), s.n))
    }

    val sorted = events.toArray.sortBy(e => (microsOf(e.ts), e.event_id))
    val closed = Seq.newBuilder[ClosedSession]
    var open = state.getOption

    sorted.foreach { e =>
      val tUs = microsOf(e.ts)
      open match {
        case Some(s) if tUs - s.last <= gapUs =>
          open = Some(s.copy(last = tUs, n = s.n + 1))
        case Some(s) =>
          closed += ClosedSession(
            userId, s.sessionSeq,
            new Timestamp(s.start / 1000), new Timestamp(s.last / 1000), s.n)
          open = Some(OpenSession(tUs, tUs, 1, s.sessionSeq + 1))
        case None =>
          open = Some(OpenSession(tUs, tUs, 1, 0))
      }
    }

    open.foreach { s =>
      state.update(s)
      // close the session once the watermark is `gap` past its last event
      state.setTimeoutTimestamp(s.last / 1000 + gapUs / 1000)
    }
    closed.result().iterator
  }

  /** Sessionize a (possibly streaming) events frame with columns
    * `user_id: long, event_id: long, ts: timestamp`.
    */
  def sessionize(
      events: DataFrame,
      gapMinutes: Int = 30,
      watermarkDelay: String = "10 minutes"): Dataset[ClosedSession] = {
    implicit val evEnc: Encoder[Event] = Encoders.product[Event]
    implicit val stEnc: Encoder[OpenSession] = Encoders.product[OpenSession]
    implicit val outEnc: Encoder[ClosedSession] = Encoders.product[ClosedSession]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong

    val gapUs = gapMinutes.toLong * 60L * 1000000L
    events
      .selectExpr("user_id", "event_id", "ts")
      .withWatermark("ts", watermarkDelay)
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(step(gapUs))
  }

  /** Watch `srcDir` for event parquet/json drops and stream closed sessions
    * to an in-memory table `sessions` (tests) or console.
    */
  def start(
      spark: SparkSession,
      src: DataFrame,
      queryName: String = "sessions",
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    sessionize(src)
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("append")
      .trigger(trigger)
      .start()
}
