package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin
import graft.queries.Tables

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("window boundaries are [t - w, t): inclusive start, exclusive end") {
    val probe = Seq((1L, ts(100), 1L)).toDF("k", "ts", "pid")
    val build = Seq(
      (1L, ts(39), "too-old"),       // t - w - 1s → out
      (1L, ts(40), "at-start"),      // exactly t - w → in (inclusive start)
      (1L, ts(99), "just-before"),   // in
      (1L, ts(100), "same-instant"), // exclusive end → out
      (2L, ts(99), "other-key")      // out
    ).toDF("k", "ts", "tag")
    val out = RangeJoin.recentWithin(probe, build, "k", "ts", windowUs = 60L * 1000000)
      .select("b_tag").collect().map(_.getString(0)).toSet
    assert(out == Set("at-start", "just-before"), s"got $out")
  }

  test("bucketed range join equals the naive theta-join on real events") {
    val ev = Tables(spark, "/root/testdata/sf0.001", "events")
    val errors = ev.filter(col("event_type") === "error").select("event_id", "user_id", "ts")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    val w = 5L * 60 * 1000000
    val naive = errors.join(clicks,
        col("c_user") === col("user_id") &&
          unix_micros(col("c_ts")) >= unix_micros(col("ts")) - w &&
          unix_micros(col("c_ts")) < unix_micros(col("ts")))
      .groupBy("event_id").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bucketed = RangeJoin
      .recentWithin(errors, clicks.select(col("c_user").as("user_id"), col("c_ts").as("ts")),
        "user_id", "ts", w)
      .groupBy("event_id").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.nonEmpty, "fixture must produce matches")
    assert(bucketed == naive,
      s"missing=${(naive -- bucketed).take(5)} extra=${(bucketed -- naive).take(5)}")
  }

  test("range join plans as a hash equi-join, not nested-loop") {
    val ev = Tables(spark, "/root/testdata/sf0.001", "events")
    val plan = RangeJoin.recentWithin(
        ev.select("event_id", "user_id", "ts"),
        ev.select("user_id", "ts"), "user_id", "ts", 60000000L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.linesIterator.take(15).mkString("\n"))
    assert(!plan.contains("CartesianProduct"))
  }
}
