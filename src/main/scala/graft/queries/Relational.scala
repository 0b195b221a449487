package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator inventory: scan/project/filter, global sort, top-k,
  * aggregation (group/having/distinct/rollup/cube), joins (inner, multiway
  * broadcast, left outer, full outer, semi, anti, as-of), windows (rank,
  * running sum, lag), set ops (union/intersect/except), JSON extraction,
  * time bucketing and sessionization.
  *
  * The reference itself has none of these (SURVEY §2.6) — they are the
  * north-star extension surface, expressed 1:1 as Catalyst-optimized
  * built-ins. Every query here is scale-shaped: filters/projections push to
  * the parquet scan, dimension joins are broadcast, aggregates are partial
  * (map-side) before the shuffle, and windows partition by high-cardinality
  * keys.
  */
object Relational {

  /** Exact, order-independent sum of a double column: per-value decimal cast
    * (deterministic), decimal addition (associative/commutative), surfaced
    * as double. Keeps Spark and the DuckDB oracle bit-identical regardless
    * of partitioning/accumulation order.
    */
  private def dsum(c: String, scale: Int = 2): org.apache.spark.sql.Column =
    sum(col(c).cast(org.apache.spark.sql.types.DecimalType(18, scale))).cast("double")

  /** q141: hourly event-volume anomaly screen — see the registration
    * comment for the integer-exact 2σ derivation. Exposed so the spec can
    * drive planted gap/spike fixtures through the identical arithmetic.
    */
  def volumeAnomaly(events: DataFrame): DataFrame = {
    // FLOOR division in exact int64 (matching DuckDB's `//`): `div` alone
    // truncates toward zero, so pre-1970 (negative-epoch) timestamps would
    // bucket one hour late. pmod is non-negative, so subtracting it leaves
    // an exact multiple of the divisor and `div` becomes floor for any sign.
    val hourly = events
      .select(col("event_type"),
        expr("(unix_micros(ts) - pmod(unix_micros(ts), 3600000000)) div 3600000000")
          .as("h"))
      .groupBy("event_type", "h").agg(count(lit(1)).as("c"))
    val dense = hourly.groupBy("event_type")
      .agg(min("h").as("h0"), max("h").as("h1"))
      .select(col("event_type"), explode(sequence(col("h0"), col("h1"))).as("h"))
      .join(hourly, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h"), coalesce(col("c"), lit(0L)).as("c"))
    val stats = dense.groupBy("event_type").agg(
      count(lit(1)).as("n"), sum("c").as("s"), sum(col("c") * col("c")).as("q"))
    val dev = col("n") * col("c") - col("s")
    dense.join(broadcast(stats), "event_type")
      .filter(dev * dev > lit(4L) * (col("n") * col("q") - col("s") * col("s")))
      .select(col("event_type"), col("h").as("hour_id"),
        col("c").cast("long").as("n_events"),
        when(col("n") * col("c") < col("s"), "low").otherwise("high").as("status"))
      .orderBy("event_type", "hour_id")
  }

  /** q151: sequential funnel over an event stream — see the registration
    * comment for the one-shuffle shape and the fold ≡ join-chain
    * argument. `horizonUs` bounds each step's distance from the step
    * before it (72 h registered); `steps` is the ordered type sequence.
    * Exposed so FunnelSpec can drive planted orderings, horizon edges
    * and same-microsecond ties through the identical arithmetic.
    */
  /** Shared funnel core: per-user sorted (tu, step-rank) event lists —
    * ONE scan, one shuffle, collected once however many horizons fold
    * over it (q151 folds one, q153 folds the grid).
    */
  private def funnelEvents(events: DataFrame, steps: Seq[String]): DataFrame = {
    val rank = steps.zipWithIndex
      .foldLeft(lit(-1)) { case (acc, (t, i)) =>
        when(col("event_type") === t, i).otherwise(acc) }
    events
      .filter(col("event_type").isin(steps.map(x => x: Any): _*))
      .select(col("user_id"),
        struct(unix_micros(col("ts")).as("tu"), rank.as("idx")).as("ev"))
      .groupBy("user_id")
      .agg(sort_array(collect_list(col("ev"))).as("evs"))
  }

  /** The funnel fold over one user's sorted list: advance on the first
    * event of the awaited type within `horizonUs` of the previous step.
    * One definition for q151, q153 and their specs.
    */
  private def scFold(evs: org.apache.spark.sql.Column, horizonUs: Long) =
    aggregate(evs,
      struct(lit(0).as("s"), lit(0L).as("tp")),
      (st, ev) =>
        when(ev("idx") === st("s") &&
            (st("s") === 0 || ev("tu") <= st("tp") + lit(horizonUs)),
          struct((st("s") + 1).as("s"), ev("tu").as("tp")))
          .otherwise(st))("s")

  /** Shared conversion tail: per-step user counts + floored-bp
    * conversions from a (grpCols..., sc) frame — ≤ |steps|+1 histogram
    * rows per group; each row fans out to the steps it reached, so
    * n_users(step) = Σ hist, never a second pass over users.
    */
  private def convTable(
      per: DataFrame, steps: Seq[String], grpCols: Seq[String]): DataFrame = {
    val reached = per.filter(col("sc") >= 1)
      .groupBy((grpCols :+ "sc").map(col): _*).agg(count(lit(1)).as("n"))
      .select((grpCols.map(col) :+
        explode(sequence(lit(1), col("sc"))).as("step") :+ col("n")): _*)
      .groupBy((grpCols :+ "step").map(col): _*).agg(sum("n").as("n_users"))
    val w = (if (grpCols.isEmpty) Window.partitionBy()
             else Window.partitionBy(grpCols.map(col): _*)).orderBy("step")
    val names = array(steps.map(lit): _*)
    reached
      .select((grpCols.map(col) :+
        col("step").cast("int").as("step") :+
        element_at(names, col("step")).as("step_name") :+
        col("n_users").cast("long").as("n_users") :+
        first("n_users")
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("base") :+
        coalesce(lag("n_users", 1).over(w), col("n_users")).as("prev")): _*)
      .select((grpCols.map(col) :+ col("step") :+ col("step_name") :+
        col("n_users") :+
        floor(lit(10000.0) * col("n_users") / col("base"))
          .cast("long").as("conv_total_bp") :+
        floor(lit(10000.0) * col("n_users") / col("prev"))
          .cast("long").as("conv_step_bp")): _*)
      .orderBy((grpCols :+ "step").map(col): _*)
  }

  /** Per-user funnel position (user_id, sc) — q151 before its conversion
    * rollup; exposed package-private so FunnelStreamSpec can pin the
    * online fold user-for-user against the batch one.
    */
  private[graft] def funnelUserStates(
      events: DataFrame,
      steps: Seq[String] = Seq("view", "click", "purchase"),
      horizonUs: Long = 72L * 3600L * 1000000L): DataFrame =
    funnelEvents(events, steps)
      .select(col("user_id"), scFold(col("evs"), horizonUs).as("sc"))

  def funnel(
      events: DataFrame,
      steps: Seq[String] = Seq("view", "click", "purchase"),
      horizonUs: Long = 72L * 3600L * 1000000L): DataFrame =
    convTable(funnelUserStates(events, steps, horizonUs), steps, Nil)

  /** q154: the q151 funnel segmented by acquisition cohort — the
    * growth-dashboard cut: did conversion change for users whose funnel
    * STARTED in week N? The cohort key is the epoch-week of each user's
    * first step-1 event, computed from the SAME collected list the fold
    * walks (`array_min` over the step-0 entries — no second scan, no
    * extra shuffle; the conversion tail partitions by cohort). Week ids
    * use the q141 floor-safe integer division so both engines bucket
    * identically for any epoch sign.
    */
  def cohortFunnel(
      events: DataFrame,
      steps: Seq[String] = Seq("view", "click", "purchase"),
      horizonUs: Long = 72L * 3600L * 1000000L): DataFrame = {
    val weekUs = 604800000000L
    val per = funnelEvents(events, steps)
      .select(col("user_id"), col("evs"), scFold(col("evs"), horizonUs).as("sc"))
      .filter(col("sc") >= 1)
      .select(
        array_min(filter(col("evs"), e => e("idx") === lit(0)))("tu").as("t1u"),
        col("sc"))
      .select(
        expr(s"(t1u - pmod(t1u, ${weekUs}L)) div ${weekUs}L").as("cohort_week"),
        col("sc"))
    convTable(per, steps, Seq("cohort_week"))
  }

  /** q153: the q138 calibration-sweep pattern applied to the funnel —
    * conversion at every candidate horizon from ONE pass: the per-user
    * event lists collect once ([[funnelEvents]] — the corpus is never
    * re-keyed per horizon, unlike the chain-of-joins form which would
    * re-key events |grid|×|steps| times), the grid folds over the
    * COLLECTED lists (a ×|grid| fan-out over one row per user), and the
    * conversion tail partitions by horizon (3×|steps| bounded rows).
    */
  def funnelSweep(
      events: DataFrame,
      steps: Seq[String] = Seq("view", "click", "purchase"),
      horizonsHours: Seq[Long] = Seq(24L, 72L, 168L)): DataFrame = {
    val per = funnelEvents(events, steps)
      .select(explode(array(horizonsHours.map(h =>
        struct(lit(h.toInt).as("horizon_h"),
          scFold(col("evs"), h * 3600L * 1000000L).as("sc"))): _*)).as("g"))
      .select(col("g")("horizon_h").as("horizon_h"), col("g")("sc").as("sc"))
    convTable(per, steps, Seq("horizon_h"))
  }

  /** One horizon's slice of q153's oracle: the q151 chain-of-joins
    * replay with `INTERVAL h HOUR` bounds, tagged with its grid point.
    * One template for every grid point (and q151's SQL is this chain at
    * h=72) so the sweep cannot drift from the registered single-horizon
    * form.
    */
  private def funnelHorizonSql(h: Long): String =
    s"""(WITH v AS (SELECT user_id, MIN(ts) AS t1 FROM events
       |            WHERE event_type = 'view' GROUP BY user_id),
       | c AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
       |       JOIN v ON v.user_id = e.user_id
       |         AND e.ts >= v.t1 AND e.ts <= v.t1 + INTERVAL $h HOUR
       |       WHERE e.event_type = 'click' GROUP BY e.user_id),
       | p AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
       |       JOIN c ON c.user_id = e.user_id
       |         AND e.ts >= c.t2 AND e.ts <= c.t2 + INTERVAL $h HOUR
       |       WHERE e.event_type = 'purchase' GROUP BY e.user_id),
       | n AS (SELECT 1 AS step, 'view' AS step_name,
       |              (SELECT COUNT(*) FROM v) AS n_users
       |       UNION ALL SELECT 2, 'click', (SELECT COUNT(*) FROM c)
       |       UNION ALL SELECT 3, 'purchase', (SELECT COUNT(*) FROM p))
       | SELECT $h AS horizon_h, step, step_name,
       |   CAST(n_users AS BIGINT) AS n_users,
       |   CAST(FLOOR(10000.0 * n_users /
       |        FIRST_VALUE(n_users) OVER (ORDER BY step)) AS BIGINT)
       |     AS conv_total_bp,
       |   CAST(FLOOR(10000.0 * n_users /
       |        LAG(n_users, 1, n_users) OVER (ORDER BY step)) AS BIGINT)
       |     AS conv_step_bp
       | FROM n)""".stripMargin

  val all: Map[String, Q] = Map(
    "q01_scan_project" -> Q(
      "Projection + pushed filter over lineitem (PushedFilters + ReadSchema pruning)",
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1996-01-01'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      Tables.raw(s, dir, "lineitem")
        .filter(col("l_shipdate") < to_timestamp(lit("1996-01-01")))
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
    },

    "q02_filter_like" -> Q(
      "Range + LIKE predicates over part",
      """SELECT p_partkey, p_name, p_size FROM part
        |WHERE p_size BETWEEN 10 AND 20 AND p_brand LIKE 'Brand#1%'
        |ORDER BY p_partkey""".stripMargin) { (s, dir) =>
      Tables(s, dir, "part")
        .filter(col("p_size").between(10, 20) && col("p_brand").like("Brand#1%"))
        .select("p_partkey", "p_name", "p_size")
        .orderBy("p_partkey")
    },

    "q03_sort_global" -> Q(
      "Global total sort (range-partitioned exchange at scale)",
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey""".stripMargin) { (s, dir) =>
      Tables.raw(s, dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    },

    "q04_topk" -> Q(
      "Top-k: ORDER BY + LIMIT plans as TakeOrderedAndProject (no full sort materialization)",
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin) { (s, dir) =>
      Tables.raw(s, dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)
    },

    "q05_agg_pricing" -> Q(
      "TPC-H Q1-style grouped aggregation (partial agg before single shuffle)",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum("l_quantity").as("sum_qty"),
          dsum("l_extendedprice").as("sum_base_price"),
          sum(expr("CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"))
            .cast("double").as("sum_disc_price"),
          (dsum("l_quantity") / count(lit(1))).as("avg_qty"),
          (dsum("l_discount") / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    "q06_group_having" -> Q(
      "GROUP BY + HAVING over a high-cardinality key",
      """SELECT l_suppkey, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY l_suppkey HAVING COUNT(*) > 5
        |ORDER BY l_suppkey""".stripMargin) { (s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(count(lit(1)).as("cnt"), dsum("l_quantity").as("sum_qty"))
        .filter(col("cnt") > 5)
        .orderBy("l_suppkey")
    },

    "q07_distinct" -> Q(
      "DISTINCT (partial-dedup before shuffle)",
      "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment") { (s, dir) =>
      Tables(s, dir, "customer").select("c_mktsegment").distinct().orderBy("c_mktsegment")
    },

    "q08_count_distinct" -> Q(
      "COUNT(DISTINCT) via expand + two-phase agg",
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts FROM lineitem
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("n_parts"))
        .orderBy("l_returnflag")
    },

    "q09_rollup" -> Q(
      "ROLLUP grouping sets",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, dir) =>
      Tables(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(dsum("l_quantity").as("sum_qty"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    },

    "q10_cube" -> Q(
      "CUBE grouping sets",
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, dir) =>
      Tables(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    },

    // PIVOT with an EXPLICIT value list — the scale-relevant form: without
    // it Spark runs a values-discovery job (collect distinct event_type)
    // before it can even plan, an extra corpus pass a 100 TB pipeline
    // cannot afford for a vocabulary that is fixed in the schema contract.
    // Explicit values keep it one pass: pivot lowers to a single groupBy
    // with one conditional aggregate per column — exactly what the oracle
    // spells out as COUNT(*) FILTER arms. Day keyed as a formatted string
    // (the q110_hourly precedent: never emit raw timestamps cross-engine).
    "q160_pivot_daily" -> Q(
      "PIVOT (explicit value list): daily event-type count matrix, " +
        "one pass, no values-discovery job",
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |  COUNT(*) FILTER (event_type = 'click') AS click,
        |  COUNT(*) FILTER (event_type = 'error') AS error,
        |  COUNT(*) FILTER (event_type = 'purchase') AS purchase,
        |  COUNT(*) FILTER (event_type = 'signup') AS signup,
        |  COUNT(*) FILTER (event_type = 'view') AS view
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin) { (s, dir) =>
      Tables(s, dir, "events")
        .withColumn("day", date_format(date_trunc("day", col("ts")), "yyyy-MM-dd"))
        .groupBy("day")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("day")
    },

    // UNPIVOT — q160's inverse, completing the reshaping pair: the wide
    // day × event-type matrix melts back to long form, KEEPING the
    // zero cells the pivot densified (the honest melt semantics — the
    // plain groupBy long form has no row for a type absent on a day, the
    // unpivoted matrix does). Dataset.unpivot is one local expand over
    // the already-aggregated matrix: no new shuffle, 5 rows out per day
    // row in, however wide the corpus. Oracle: DuckDB's SQL-standard
    // UNPIVOT over the identical wide CTE.
    "q181_unpivot_daily" -> Q(
      "UNPIVOT: the q160 matrix melted back to (day, event_type, n), " +
        "zero cells kept — the densified long form",
      """WITH wide AS (
        |  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |    COUNT(*) FILTER (event_type = 'click') AS click,
        |    COUNT(*) FILTER (event_type = 'error') AS error,
        |    COUNT(*) FILTER (event_type = 'purchase') AS purchase,
        |    COUNT(*) FILTER (event_type = 'signup') AS signup,
        |    COUNT(*) FILTER (event_type = 'view') AS view
        |  FROM events GROUP BY 1)
        |SELECT day, event_type, CAST(n AS BIGINT) AS n
        |FROM wide UNPIVOT (n FOR event_type IN
        |  (click, error, purchase, signup, view))
        |ORDER BY day, event_type""".stripMargin) { (s, dir) =>
      Tables(s, dir, "events")
        .withColumn("day", date_format(date_trunc("day", col("ts")), "yyyy-MM-dd"))
        .groupBy("day")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .unpivot(Array(col("day")),
          Array(col("click"), col("error"), col("purchase"),
            col("signup"), col("view")),
          "event_type", "n")
        .orderBy("day", "event_type")
    },

    "q11_join_inner" -> Q(
      "Inner join fact→dim with broadcast (no shuffle of orders)",
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
      Tables(s, dir, "orders")
        .join(broadcast(Tables(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"), dsum("o_totalprice").as("revenue"))
        .orderBy("c_mktsegment")
    },

    "q12_join_stars" -> Q(
      "TPC-H Q5-style 5-way star join, all dims broadcast; one fact shuffle for the agg",
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY n_name""".stripMargin) { (s, dir) =>
      Tables(s, dir, "lineitem")
        .join(Tables(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .groupBy("n_name")
        .agg(
          sum(expr("CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("n_name")
    },

    "q13_join_left" -> Q(
      "Left outer join preserving unmatched customers",
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      Tables(s, dir, "customer")
        .join(Tables(s, dir, "orders"), col("o_custkey") === col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy("c_custkey")
    },

    "q14_join_semi" -> Q(
      "Left semi join (EXISTS) — no payload duplication, build side reduced by pushed filter",
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 100000)
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      Tables(s, dir, "customer")
        .join(
          Tables(s, dir, "orders").filter(col("o_totalprice") > 100000),
          col("o_custkey") === col("c_custkey"),
          "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    "q15_join_anti" -> Q(
      "Left anti join (NOT EXISTS)",
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      Tables(s, dir, "customer")
        .join(Tables(s, dir, "orders"), col("o_custkey") === col("c_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    "q16_join_full" -> Q(
      "Full outer join of two pre-aggregated sides",
      """SELECT COALESCE(c.nk, s.nk) AS nationkey, c.n_cust, s.n_supp
        |FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey) c
        |FULL JOIN (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey) s
        |ON c.nk = s.nk
        |ORDER BY nationkey""".stripMargin) { (s, dir) =>
      val c = Tables(s, dir, "customer").groupBy(col("c_nationkey").as("cnk"))
        .agg(count(lit(1)).as("n_cust"))
      val p = Tables(s, dir, "supplier").groupBy(col("s_nationkey").as("snk"))
        .agg(count(lit(1)).as("n_supp"))
      c.join(p, col("cnk") === col("snk"), "full")
        .select(coalesce(col("cnk"), col("snk")).as("nationkey"), col("n_cust"), col("n_supp"))
        .orderBy("nationkey")
    },

    "q17_window_rank" -> Q(
      "Window RANK per partition + filter (top-3 orders per customer)",
      """SELECT o_custkey, o_orderkey, rnk FROM (
        |  SELECT o_custkey, o_orderkey,
        |         RANK() OVER (PARTITION BY o_custkey
        |                      ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders) t
        |WHERE rnk <= 3 ORDER BY o_custkey, rnk, o_orderkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), rank().over(w).as("rnk"))
        .filter(col("rnk") <= 3)
        .orderBy("o_custkey", "rnk", "o_orderkey")
    },

    "q18_window_running" -> Q(
      "Running sum window (exact decimal accumulation)",
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, dir, "orders")
        .select(
          col("o_custkey"),
          col("o_orderkey"),
          sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
            .over(w).cast("double").as("running"))
        .orderBy("o_custkey", "o_orderkey")
    },

    "q19_window_lag" -> Q(
      "LAG window — per-user deltas over the events stream table",
      """SELECT user_id, event_id,
        |  value - LAG(value) OVER (PARTITION BY user_id ORDER BY event_id) AS delta
        |FROM events ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("event_id")
      Tables(s, dir, "events")
        .select(
          col("user_id"),
          col("event_id"),
          (col("value") - lag("value", 1).over(w)).as("delta"))
        .orderBy("user_id", "event_id")
    },

    "q20_union" -> Q(
      "UNION (distinct) of two key sets",
      """SELECT c_nationkey AS nk FROM customer
        |UNION SELECT s_nationkey AS nk FROM supplier ORDER BY nk""".stripMargin) { (s, dir) =>
      Tables(s, dir, "customer").select(col("c_nationkey").as("nk"))
        .union(Tables(s, dir, "supplier").select(col("s_nationkey").as("nk")))
        .distinct()
        .orderBy("nk")
    },

    "q21_intersect" -> Q(
      "INTERSECT (customers that do have orders)",
      """SELECT c_custkey FROM customer
        |INTERSECT SELECT o_custkey FROM orders ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      Tables(s, dir, "customer").select("c_custkey")
        .intersect(Tables(s, dir, "orders").select("o_custkey"))
        .orderBy("c_custkey")
    },

    "q22_except" -> Q(
      "EXCEPT (customers without orders)",
      """SELECT c_custkey FROM customer
        |EXCEPT SELECT o_custkey FROM orders ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      Tables(s, dir, "customer").select("c_custkey")
        .except(Tables(s, dir, "orders").select("o_custkey"))
        .orderBy("c_custkey")
    },

    "q23_json_extract" -> Q(
      "JSON path extraction from a string column (events.props)",
      """SELECT event_type,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  COUNT(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      Tables(s, dir, "events")
        .groupBy("event_type")
        .agg(
          sum(get_json_object(col("props"), "$.k").cast("long")).as("sum_k"),
          count(lit(1)).as("n"))
        .orderBy("event_type")
    },

    "q24_events_hourly" -> Q(
      "Tumbling time-window aggregation (hourly buckets)",
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        |  event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin) { (s, dir) =>
      Tables(s, dir, "events")
        .groupBy(
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
            .cast("double").as("sum_value"))
        .orderBy("hour", "event_type")
    },

    // VOLUME ANOMALY SCREEN — ingestion monitoring for the events feed:
    // flag hours whose event volume sits outside 2σ of the type's hourly
    // mean, over the DENSIFIED hour span (a silent ingestion gap is an
    // all-zero hour — exactly the anomaly a sparse grouping would never
    // emit). The 2σ rule is evaluated WITHOUT A SINGLE FLOAT: with
    // integer counts, |c − S/n| > 2σ ⟺ (n·c − S)² > 4·(n·Q − S²) where
    // S = Σc, Q = Σc² over the span — pure int64 arithmetic (bounds: c ≤
    // 1e5-ish, span ≤ 1e4 hours keeps every product < 2^63), so both
    // engines flag identical hours with no ulp argument needed. Plan:
    // one hourly aggregate (q24's exchange), a per-type span densify
    // (sequence explode — bounded by the corpus time span), per-type
    // 3-number stats broadcast back.
    "q141_volume_anomaly" -> Q(
      "Hourly event-volume anomaly screen: integer-exact 2-sigma rule per " +
        "event_type over the densified hour span (gaps flag as `low`)",
      """WITH e AS (SELECT event_type,
        |             CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS h
        |           FROM events),
        |hc AS (SELECT event_type, h, COUNT(*) AS c FROM e GROUP BY event_type, h),
        |sp AS (SELECT event_type, MIN(h) AS h0, MAX(h) AS h1 FROM hc GROUP BY event_type),
        |grid AS (SELECT event_type, unnest(generate_series(h0, h1)) AS h FROM sp),
        |dense AS (SELECT grid.event_type, grid.h, COALESCE(hc.c, 0) AS c
        |          FROM grid LEFT JOIN hc
        |            ON hc.event_type = grid.event_type AND hc.h = grid.h),
        |st AS (SELECT event_type, COUNT(*) AS n, SUM(c) AS s, SUM(c * c) AS q
        |       FROM dense GROUP BY event_type)
        |SELECT d.event_type, d.h AS hour_id, CAST(d.c AS BIGINT) AS n_events,
        |  CASE WHEN st.n * d.c < st.s THEN 'low' ELSE 'high' END AS status
        |FROM dense d JOIN st ON st.event_type = d.event_type
        |WHERE (st.n * d.c - st.s) * (st.n * d.c - st.s) > 4 * (st.n * st.q - st.s * st.s)
        |ORDER BY d.event_type, hour_id""".stripMargin) { (s, dir) =>
      volumeAnomaly(Tables(s, dir, "events"))
    },

    "q25_sessionize" -> Q(
      "Sessionization: 30-min-gap session ids via lag + running sum windows",
      """WITH g AS (
        |  SELECT user_id, event_id, ts,
        |         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
        |              OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
        |              THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |s AS (
        |  SELECT user_id, event_id,
        |         CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM g)
        |SELECT user_id, session_id, COUNT(*) AS n_events
        |FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin) { (s, dir) =>
      val byTime = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      val cum = byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, dir, "events")
        .select(
          col("user_id"), col("event_id"), col("ts"),
          when(unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(byTime)
            > 1800000000L, 1L).otherwise(0L).as("brk"))
        .select(
          col("user_id"), col("event_id"),
          sum("brk").over(cum).as("session_id"))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"))
        .orderBy("user_id", "session_id")
    },

    // SESSION-GAP SWEEP — the q130/q135 calibration pattern on the
    // events side: q25 hard-codes the 30-minute session gap; before a
    // product team commits to one, this sweeps the gap grid in ONE pass
    // and reports how the session count responds. A session START is a
    // first event (null gap) or a gap above the threshold, so
    // n_sessions = Σ starts — no per-gap re-sessionization, just the
    // per-event gap (one window, q25's exchange) fanned out ×4 against
    // the bounded grid and summed. Timestamps never reach the output
    // (the oracle-determinism house rule); epoch-µs arithmetic matches
    // q25's oracle convention.
    "q138_session_gap_sweep" -> Q(
      "Session gap sweep: session/user/event counts at 5/30/60/120-minute " +
        "gap thresholds from one windowed pass over events",
      """WITH g AS (
        |  SELECT user_id,
        |    epoch_us(ts) - LAG(epoch_us(ts))
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        |  FROM events),
        |e AS (SELECT user_id, gap_us,
        |        CAST(unnest([5, 30, 60, 120]) AS BIGINT) AS gap_min
        |      FROM g)
        |SELECT gap_min,
        |  COUNT(DISTINCT user_id) AS n_users,
        |  CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us > gap_min * 60000000
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
        |  COUNT(*) AS n_events
        |FROM e GROUP BY gap_min ORDER BY gap_min""".stripMargin) { (s, dir) =>
      val byTime = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      val starts = col("gap_us").isNull ||
        col("gap_us") > col("gap_min") * lit(60000000L)
      Tables(s, dir, "events")
        .select(col("user_id"),
          (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(byTime))
            .as("gap_us"))
        .select(col("user_id"), col("gap_us"),
          explode(array(Seq(5L, 30L, 60L, 120L).map(lit): _*)).as("gap_min"))
        .groupBy("gap_min")
        .agg(
          countDistinct(col("user_id")).as("n_users"),
          sum(when(starts, 1L).otherwise(0L)).as("n_sessions"),
          count(lit(1)).as("n_events"))
        .orderBy("gap_min")
    },

    // FUNNEL ANALYSIS, conversion-rate form — the event-sequence family
    // member between sessionization (q25) and the as-of join (q26).
    // q60 already registers the stage-COUNT funnel (signup→view→click→
    // purchase, strict `>`, 12 h, lexicographic tie order, counts only);
    // this is the CONVERSION form a growth dashboard reads — per-step
    // users plus floored-bp conversion vs the base and the previous
    // step, tie-INCLUSIVE (a click at the view's microsecond counts, in
    // step order) with a 72 h horizon — and the root of a family q60's
    // single registration can't host: the horizon sweep (q153) and the
    // online state machine (streaming/FunnelStream) fold the same core.
    // ONE shuffle, not one per step (q60's funnelSinglePass argument,
    // factored here into funnelEvents/scFold/convTable so the three
    // family members cannot drift): the per-step chain-of-joins
    // formulation (the oracle's replay, and the textbook SQL) re-keys
    // the events table once per funnel step; here each user's step
    // events collect into ONE sorted list (partial ObjectHashAggregate,
    // payload bounded by that user's funnel events) and a codegen'd
    // `aggregate` fold walks it — advance on the first event of the
    // awaited type inside the horizon. The fold and the
    // join chain provably agree: sorting by (ts, step-rank) puts any
    // candidate with ts ≥ t_prev after the advancing event, so the first
    // qualifying event in fold order IS the chain's MIN(ts) — ties at
    // the same microsecond advance in step order in both. Timestamps
    // stay internal (epoch-µs longs; the output is counts — the
    // no-timestamp house rule); conversions are floored basis points
    // (single IEEE division). Skew note: a bot user's list grows with
    // its own event count only — the corpus never concentrates.
    "q151_funnel" -> Q(
      "Funnel analysis: users reaching view -> click -> purchase, each " +
        "step within 72h of the previous, via one sorted per-user fold",
      """WITH v AS (SELECT user_id, MIN(ts) AS t1 FROM events
        |           WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
        |      JOIN v ON v.user_id = e.user_id
        |        AND e.ts >= v.t1 AND e.ts <= v.t1 + INTERVAL 72 HOUR
        |      WHERE e.event_type = 'click' GROUP BY e.user_id),
        |p AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
        |      JOIN c ON c.user_id = e.user_id
        |        AND e.ts >= c.t2 AND e.ts <= c.t2 + INTERVAL 72 HOUR
        |      WHERE e.event_type = 'purchase' GROUP BY e.user_id),
        |n AS (SELECT 1 AS step, 'view' AS step_name,
        |             (SELECT COUNT(*) FROM v) AS n_users
        |      UNION ALL SELECT 2, 'click', (SELECT COUNT(*) FROM c)
        |      UNION ALL SELECT 3, 'purchase', (SELECT COUNT(*) FROM p))
        |SELECT step, step_name, CAST(n_users AS BIGINT) AS n_users,
        |  CAST(FLOOR(10000.0 * n_users /
        |       FIRST_VALUE(n_users) OVER (ORDER BY step)) AS BIGINT)
        |    AS conv_total_bp,
        |  CAST(FLOOR(10000.0 * n_users /
        |       LAG(n_users, 1, n_users) OVER (ORDER BY step)) AS BIGINT)
        |    AS conv_step_bp
        |FROM n ORDER BY step""".stripMargin) { (s, dir) =>
      funnel(Tables(s, dir, "events"))
    },

    // FUNNEL HORIZON SWEEP — q138's calibration-sweep move applied to
    // q151: before a product team commits to "within 72h", sweep the
    // horizon grid {24h, 72h, 168h} in ONE pass. The per-user event
    // lists collect once and the grid folds over them — the corpus is
    // never re-keyed per horizon, where the oracle's chain-of-joins
    // replay re-keys events per (horizon, step). Oracle: the q151 chain
    // per grid point, UNION ALL'd (built by [[funnelHorizonSql]] from
    // one template so the grid points cannot drift from each other);
    // FunnelSpec pins the h=72 slice row-identical to q151.
    "q153_funnel_sweep" -> Q(
      "Funnel horizon sweep: view -> click -> purchase conversion at " +
        "24h/72h/168h step horizons from one pass over per-user event lists",
      Seq(24L, 72L, 168L).map(funnelHorizonSql).mkString(
        "", "\nUNION ALL\n", "\nORDER BY horizon_h, step")) { (s, dir) =>
      funnelSweep(Tables(s, dir, "events"))
    },

    // COHORT-SEGMENTED FUNNEL (see [[cohortFunnel]]): q151 cut by the
    // epoch-week of each user's first view — the per-cohort conversion
    // trend a growth team actually tracks (is this week's acquisition
    // converting worse than last week's?). Same one-shuffle core; the
    // cohort key is read off the already-collected event list. Oracle:
    // the q151 chain with the cohort key joined onto each stage's user
    // set, conversions windowed PER COHORT. A cohort with zero clicks
    // simply has no step-2 row — identically on both sides, so the
    // funnel's monotone structure keeps the frames aligned.
    "q154_cohort_funnel" -> Q(
      "Cohort-segmented funnel: per first-view-week conversion through " +
        "view -> click -> purchase, 72h step horizon, one pass",
      """WITH v AS (SELECT user_id, MIN(ts) AS t1 FROM events
        |           WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
        |      JOIN v ON v.user_id = e.user_id
        |        AND e.ts >= v.t1 AND e.ts <= v.t1 + INTERVAL 72 HOUR
        |      WHERE e.event_type = 'click' GROUP BY e.user_id),
        |p AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
        |      JOIN c ON c.user_id = e.user_id
        |        AND e.ts >= c.t2 AND e.ts <= c.t2 + INTERVAL 72 HOUR
        |      WHERE e.event_type = 'purchase' GROUP BY e.user_id),
        |k AS (SELECT user_id,
        |        CAST(epoch_us(t1) // 604800000000 AS BIGINT) AS cohort_week
        |      FROM v),
        |n AS (SELECT cohort_week, 1 AS step, 'view' AS step_name,
        |             COUNT(*) AS n_users FROM k GROUP BY cohort_week
        |      UNION ALL SELECT cohort_week, 2, 'click', COUNT(*)
        |        FROM k JOIN c USING (user_id) GROUP BY cohort_week
        |      UNION ALL SELECT cohort_week, 3, 'purchase', COUNT(*)
        |        FROM k JOIN p USING (user_id) GROUP BY cohort_week)
        |SELECT cohort_week, step, step_name, CAST(n_users AS BIGINT) AS n_users,
        |  CAST(FLOOR(10000.0 * n_users / FIRST_VALUE(n_users)
        |       OVER (PARTITION BY cohort_week ORDER BY step)) AS BIGINT)
        |    AS conv_total_bp,
        |  CAST(FLOOR(10000.0 * n_users / LAG(n_users, 1, n_users)
        |       OVER (PARTITION BY cohort_week ORDER BY step)) AS BIGINT)
        |    AS conv_step_bp
        |FROM n ORDER BY cohort_week, step""".stripMargin) { (s, dir) =>
      cohortFunnel(Tables(s, dir, "events"))
    },

    "q26_asof_join" -> Q(
      "As-of join: latest prior click per purchase (union + last_value window — " +
        "single shuffle by user, no per-key loops; DuckDB oracle mirrors the same plan)",
      """WITH u AS (
        |  SELECT user_id, ts, event_id, event_type,
        |         CASE WHEN event_type = 'click' THEN event_id END AS click_id
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |w AS (
        |  SELECT user_id, event_id, event_type,
        |         LAST_VALUE(click_id IGNORE NULLS)
        |           OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_id
        |  FROM u)
        |SELECT event_id, user_id, last_click_id
        |FROM w WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin) { (s, dir) =>
      graft.operators.AsOfJoin.lastPriorEvent(
        Tables(s, dir, "events"),
        matchType = "click", probeType = "purchase")
        .orderBy("event_id")
    }
  )
}
