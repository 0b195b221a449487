package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.queries.{Relational, Tables}
import graft.streaming.FunnelStream
import graft.streaming.FunnelStream.Event

/** The online funnel's stream ≡ batch contract: under per-user
  * event-time-ordered micro-batches the final per-user position equals
  * q151's fold user-for-user (same fold, split at batch boundaries), the
  * horizon binds across batch boundaries, and a user emits a progress
  * row only when they ADVANCE.
  */
class FunnelStreamSpec extends SparkSpec {

  private implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
  private implicit val evEnc: org.apache.spark.sql.Encoder[Event] =
    org.apache.spark.sql.Encoders.product[Event]

  private val hour = 3600L * 1000000L

  private def ev(u: Long, us: Long, t: String) =
    Event(u, new Timestamp(us / 1000L), t)

  test("advances across micro-batches; horizon binds across the boundary") {
    val input = MemoryStream[Event]
    val q = FunnelStream.start(spark, input.toDF(), queryName = "funnel_t",
      trigger = Trigger.ProcessingTime(0))
    def table() = spark.table("funnel_t")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq

    // batch 1: user 1 views; user 2 views
    input.addData(ev(1, 1 * hour, "view"), ev(2, 1 * hour, "view"))
    q.processAllAvailable()
    assert(table().sorted == Seq((1L, 1), (2L, 1)))

    // batch 2: user 1 clicks INSIDE the 72h horizon of the batch-1 view;
    // user 2 clicks OUTSIDE it — only user 1 advances (and only user 1
    // emits). An unrelated purchase for user 1 is out of order and must
    // not advance past the awaited step.
    input.addData(ev(1, 50 * hour, "click"), ev(2, 80 * hour, "click"))
    q.processAllAvailable()
    assert(table().sorted == Seq((1L, 1), (1L, 2), (2L, 1)),
      s"only the inside-horizon click may advance, got ${table().sorted}")

    // batch 3: user 1 purchases within 72h of the click — full conversion;
    // user 2's late click still cannot advance (their funnel is stuck)
    input.addData(ev(1, 100 * hour, "purchase"), ev(2, 90 * hour, "click"))
    q.processAllAvailable()
    assert(table().sorted == Seq((1L, 1), (1L, 2), (1L, 3), (2L, 1)))
    q.stop()
  }

  test("a no-advance micro-batch emits nothing") {
    val input = MemoryStream[Event]
    val q = FunnelStream.start(spark, input.toDF(), queryName = "funnel_q",
      trigger = Trigger.ProcessingTime(0))
    input.addData(ev(7, 1 * hour, "view"))
    q.processAllAvailable()
    val n1 = spark.table("funnel_q").count()
    // more views and an error type: nobody advances
    input.addData(ev(7, 2 * hour, "view"), ev(7, 3 * hour, "error"))
    q.processAllAvailable()
    assert(spark.table("funnel_q").count() == n1,
      "a batch that advances nobody must emit nothing")
    q.stop()
  }

  test("corpus replay in time-ordered batches equals the batch fold user-for-user") {
    val events = Tables(spark, "/root/testdata/sf0.001", "events")
      .select(col("user_id"), col("ts"), col("event_type"))
    // three per-user-ordered micro-batches: a global time split (the
    // ordered-feed discipline the contract requires)
    val cuts = Seq("2024-01-11 00:00:00", "2024-01-21 00:00:00")
    val chunks = Seq(
      events.filter(col("ts") < cuts(0)),
      events.filter(col("ts") >= cuts(0) && col("ts") < cuts(1)),
      events.filter(col("ts") >= cuts(1)))

    val input = MemoryStream[Event]
    val q = FunnelStream.start(spark, input.toDF(), queryName = "funnel_c",
      trigger = Trigger.ProcessingTime(0))
    for (c <- chunks) {
      input.addData(c.as[Event].collect().toSeq)
      q.processAllAvailable()
    }
    // update-mode emissions are monotone per user: the max is the final
    // position; users who never reached step 1 are absent on both sides
    val online = spark.table("funnel_c")
      .groupBy("user_id").agg(max("steps_completed").as("sc"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val batch = Relational.funnelUserStates(events)
      .filter(col("sc") >= 1)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(online == batch,
      s"online funnel diverges from the batch fold: ${online.size} vs ${batch.size} users")
    q.stop()
  }
}
