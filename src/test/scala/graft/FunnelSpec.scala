package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.{Relational, Tables}

/** q151's fold semantics, pinned case by case: strict step order, the
  * 72h horizon measured from the PREVIOUS step, same-microsecond ties
  * advancing in step order, and — on both real corpora — row identity
  * between the one-shuffle fold and the independently-written
  * chain-of-min-joins formulation the DuckDB oracle replays.
  */
class FunnelSpec extends SparkSpec {

  private val H = 72L * 3600L * 1000000L

  /** Planted-row funnel: build events at explicit epoch-µs offsets. */
  private def evUs(rows: Seq[(Long, Long, String)]): DataFrame = {
    import spark.implicits._
    rows.zipWithIndex.map { case ((uid, us, t), i) => (i.toLong, us, uid, t) }
      .toDF("event_id", "us", "user_id", "event_type")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), col("event_type"))
  }

  private def stepsReached(df: DataFrame): Map[Int, Long] =
    Relational.funnel(df).collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap

  test("strict order: a purchase before the click does not advance the funnel") {
    val hour = 3600L * 1000000L
    val d = evUs(Seq(
      // user 1: view, purchase, click — purchase precedes the click, so
      // the funnel stalls at step 2 (the later purchase is missing)
      (1L, 1 * hour, "view"), (1L, 2 * hour, "purchase"), (1L, 3 * hour, "click"),
      // user 2: the full ordered path
      (2L, 1 * hour, "view"), (2L, 2 * hour, "click"), (2L, 3 * hour, "purchase"),
      // user 3: clicks and purchases but never a view — enters nothing
      (3L, 1 * hour, "click"), (3L, 2 * hour, "purchase")))
    assert(stepsReached(d) == Map(1 -> 2L, 2 -> 2L, 3 -> 1L))
  }

  test("the horizon binds each step to the PREVIOUS step, not to the first") {
    val hour = 3600L * 1000000L
    val d = evUs(Seq(
      // click lands at +71h (inside), purchase at +141h from the view
      // but only +70h from the click — still converts
      (1L, 0L, "view"), (1L, 71 * hour, "click"), (1L, 141 * hour, "purchase"),
      // click at +73h: outside the horizon, and no later click exists —
      // the funnel never advances past the view
      (2L, 0L, "view"), (2L, 73 * hour, "click"), (2L, 74 * hour, "purchase"),
      // first click outside, but a SECOND view re-opens nothing (the
      // funnel anchors to the FIRST view: min ts) — stays at step 1
      (3L, 0L, "view"), (3L, 100 * hour, "view"), (3L, 101 * hour, "click")))
    assert(stepsReached(d) == Map(1 -> 3L, 2 -> 1L, 3 -> 1L))
  }

  test("same-microsecond events advance in step order") {
    val d = evUs(Seq(
      (1L, 5L, "view"), (1L, 5L, "click"), (1L, 5L, "purchase"),
      (2L, 5L, "click"), (2L, 5L, "view")))
    // user 1 converts fully at a single microsecond; user 2's click ties
    // the view and counts (step order breaks the tie), reaching step 2
    assert(stepsReached(d) == Map(1 -> 2L, 2 -> 2L, 3 -> 1L))
  }

  /** The oracle's formulation, written independently: per-step
    * MIN(ts)-chain joins with the same >= / horizon bounds.
    */
  private def chainOfJoins(events: DataFrame): Map[Int, Long] = {
    val e = events.select(col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("tu"))
    val v = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("tu").as("t1"))
    val c = e.filter(col("event_type") === "click").join(v, "user_id")
      .filter(col("tu") >= col("t1") && col("tu") <= col("t1") + H)
      .groupBy("user_id").agg(min("tu").as("t2"))
    val p = e.filter(col("event_type") === "purchase").join(c, "user_id")
      .filter(col("tu") >= col("t2") && col("tu") <= col("t2") + H)
      .groupBy("user_id").agg(min("tu").as("t3"))
    Map(1 -> v.count(), 2 -> c.count(), 3 -> p.count())
  }

  test("fold equals the chain-of-joins replay on both corpora") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val events = Tables(spark, dir, "events")
      val fold = stepsReached(events)
      val chain = chainOfJoins(events)
      assert(fold == chain, s"$dir: fold $fold vs chain $chain")
    }
  }

  test("the sweep's 72h slice is row-identical to the registered funnel") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val events = Tables(spark, dir, "events")
      val slice = Relational.funnelSweep(events)
        .filter(col("horizon_h") === 72).drop("horizon_h")
        .collect().map(_.toSeq).toSeq
      val single = Relational.funnel(events).collect().map(_.toSeq).toSeq
      assert(slice == single, s"$dir: sweep slice diverges from q151")
    }
  }

  test("a longer horizon never loses users at any step") {
    val out = Relational.funnelSweep(
      Tables(spark, "/root/testdata/sf0.01", "events"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(3)).toMap
    for (step <- 1 to 3) {
      assert(out((24, step)) <= out((72, step)), s"step $step: 24h > 72h")
      assert(out((72, step)) <= out((168, step)), s"step $step: 72h > 168h")
    }
    assert(out((24, 3)) < out((168, 3)),
      "fixture drift: the sweep should actually differentiate the horizons")
  }

  test("cohort funnel sums back to the global funnel at every step") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val events = Tables(spark, dir, "events")
      val byCohort = Relational.cohortFunnel(events)
        .groupBy("step").agg(sum("n_users").as("n"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val global = Relational.funnel(events)
        .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
      assert(byCohort == global,
        s"$dir: cohort partition must sum to the global funnel")
      assert(Relational.cohortFunnel(events)
        .select("cohort_week").distinct().count() > 1,
        s"$dir: fixture drift — cohorts should actually differentiate")
    }
  }

  test("cohorts anchor to the FIRST view and convert independently") {
    val hour = 3600L * 1000000L
    val week = 7L * 24L * 3600L * 1000000L
    val d = evUs(Seq(
      // cohort week 0: user 1 fully converts, user 2 stalls at view
      (1L, 1 * hour, "view"), (1L, 2 * hour, "click"), (1L, 3 * hour, "purchase"),
      (2L, 5 * hour, "view"),
      // cohort week 2: user 3 reaches click only; their week-0 CLICK
      // must not create a cohort (cohorts key on the first VIEW)
      (3L, 1 * hour, "click"), (3L, 2 * week, "view"), (3L, 2 * week + hour, "click")))
    val out = Relational.cohortFunnel(d)
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getLong(3))).toMap
    assert(out == Map(
      (0L, 1) -> 2L, (0L, 2) -> 1L, (0L, 3) -> 1L,
      (2L, 1) -> 1L, (2L, 2) -> 1L),
      s"got $out")
  }

  test("conversion basis points divide against base and previous step") {
    val hour = 3600L * 1000000L
    val rows = (1L to 4L).flatMap { u =>
      val base = Seq((u, 1 * hour, "view"))
      val click = if (u <= 2) Seq((u, 2 * hour, "click")) else Nil
      val buy = if (u == 1) Seq((u, 3 * hour, "purchase")) else Nil
      base ++ click ++ buy
    }
    val out = Relational.funnel(evUs(rows)).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1, "view", 4L, 10000L, 10000L),
      (2, "click", 2L, 5000L, 5000L),
      (3, "purchase", 1L, 2500L, 5000L)))
  }
}
