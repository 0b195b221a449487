package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Testdata table loaders (`/root/testdata/sf&#42;/&lt;name&gt;.parquet`).
  *
  * `events.ts` has shipped as BOTH Parquet TIMESTAMP(NANOS) and
  * TIMESTAMP(MICROS) across testdata generations, so the loader adapts to the
  * schema it observes rather than assuming one physical type:
  *   - NANOS: Spark's vectorized reader rejects it ([PARQUET_TYPE_ILLEGAL]),
  *     so we read raw nanos via `spark.sql.legacy.parquet.nanosAsLong`
  *     (observed as LongType) and convert with exact integer division
  *     (`DIV 1000`, never double division — epoch-ns overflows the 53-bit
  *     double mantissa) to µs TimestampType.
  *   - MICROS (no UTC adjustment): reads as TIMESTAMP_NTZ; cast to session-TZ
  *     TimestampType (sessions run UTC, so the instant is preserved) so
  *     downstream date_trunc/lag/window semantics match the DuckDB oracle.
  * Both branches stay live — the physical type already flipped once.
  */
object Tables {

  /** Tables small enough to always broadcast — never rebalanced. */
  private val DimTables = Set("region", "nation", "customer", "supplier", "part")

  /** Fact-table loader with scan rebalancing: the local testdata ships one
    * parquet file with ONE rowgroup per table, so the scan is a single task
    * and every compute-heavy stage above it would run on one core. When the
    * scan yields fewer splits than half the cluster parallelism, repartition
    * up. On a real lake (many files/rowgroups — the 100 TB case) the guard
    * makes this a no-op and the scan's natural splits flow through, keeping
    * filter/projection pushdown fully effective.
    */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    memo((spark, dir, name, "balanced")) {
      val df = raw(spark, dir, name)
      if (DimTables(name)) df else balanced(df)
    }

  /** DataFrames are immutable plans, so loads are memoized per
    * (session, dir, table): the split-count probe in [[balanced]] forces a
    * physical plan, and without the cache every query re-paid it.
    * get/put (not computeIfAbsent) because loads nest — a benign duplicate
    * load on a race beats a Recursive-update failure.
    */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[
      (SparkSession, String, String, String), DataFrame]()

  private def memo(key: (SparkSession, String, String, String))(load: => DataFrame): DataFrame = {
    // only the read-only driver testdata is safe to memoize: a user dir can
    // be rewritten mid-session (stale plan/schema), and caching for
    // arbitrary sessions would pin them (and their plans) forever
    if (!key._2.startsWith("/root/testdata")) load
    else {
      val hit = cache.get(key)
      if (hit != null) hit
      else {
        val df = load
        cache.putIfAbsent(key, df)
        df
      }
    }
  }

  /** Pushdown-preserving loader (no rebalance) — for scan/filter/top-k
    * queries where the parquet-level filter + projection IS the operator.
    */
  def raw(spark: SparkSession, dir: String, name: String): DataFrame =
    memo((spark, dir, name, "raw")) {
      name match {
        case "events" => events(spark, dir)
        case _        => spark.read.parquet(s"$dir/$name.parquet")
      }
    }

  private def balanced(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < math.max(2, p / 2)) df.repartition(p) else df
  }

  /** The nanosAsLong flag is scoped to a CLONED session (`newSession`
    * shares the SparkContext but owns its conf) so unrelated parquet reads
    * in the caller's session keep normal TIMESTAMP(NANOS) handling. The
    * file relation captures its creating session, so later executions of
    * plans containing this scan resolve the flag from the clone.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val scoped = eventsSessions.synchronized {
      var c = eventsSessions.get(spark)
      if (c == null) {
        c = spark.newSession()
        c.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        eventsSessions.put(spark, c)
      }
      c
    }
    // nanosAsLong only alters TIMESTAMP(NANOS) handling; MICROS files read
    // identically through the scoped session, so one read path serves both.
    val df = scoped.read.parquet(s"$dir/events.parquet")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // NANOS read as raw int64
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampNTZType => // MICROS, no UTC flag
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df // already session-TZ TimestampType
    }
  }

  // WeakHashMap, not ConcurrentHashMap: a strong key would pin every caller
  // session (and its SessionState) for the process lifetime. The clone
  // holds no reference back to its parent (`newSession` shares only
  // context/sharedState), so entries clear when the parent is collected.
  private val eventsSessions = new java.util.WeakHashMap[SparkSession, SparkSession]()
}
