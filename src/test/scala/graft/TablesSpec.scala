package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.queries.Tables

/** Loader adaptivity + testdata-drift canary.
  *
  * The driver-generated testdata has regenerated between rounds with a
  * DIFFERENT physical type for `events.ts` (TIMESTAMP(NANOS) → MICROS),
  * silently breaking every events query. Two defenses, both here:
  *   1. [[Tables.events]] must load BOTH physical types to the same logical
  *      TimestampType with identical instants (fixture-tested below, so the
  *      branch for whichever type the live testdata does NOT currently use
  *      stays covered).
  *   2. A canary that reads every live testdata table raw and asserts the
  *      loader-assumed physical types, so the next silent regeneration fails
  *      ONE named test instead of ten queries.
  */
class TablesSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("events loader: TIMESTAMP(MICROS) fixture and nanos-as-long fixture load to identical instants") {
    import spark.implicits._
    val dirMicros = Files.createTempDirectory("graft-ev-us").toString
    val dirNanos  = Files.createTempDirectory("graft-ev-ns").toString

    // Three known instants, written two ways. Spark cannot WRITE
    // TIMESTAMP(NANOS) parquet, so the nanos fixture emulates what the
    // nanosAsLong read path observes: a raw int64 `ts` column — exactly the
    // schema Tables.events sees for a NANOS file under the legacy flag.
    val instants = Seq(
      "2024-01-01 00:00:00.000001",
      "2024-06-15 12:34:56.789012",
      "2025-12-31 23:59:59.999999")
    instants.toDF("s")
      .select(to_timestamp($"s").as("ts"), monotonically_increasing_id().as("event_id"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dirMicros/events.parquet")
    instants.toDF("s")
      .select((unix_micros(to_timestamp($"s")) * 1000L).as("ts"),
        monotonically_increasing_id().as("event_id"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dirNanos/events.parquet")

    val us = Tables.events(spark, dirMicros)
    val ns = Tables.events(spark, dirNanos)
    assert(us.schema("ts").dataType === TimestampType)
    assert(ns.schema("ts").dataType === TimestampType)

    def read(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select(date_format($"ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"))
        .as[String].collect().toSeq.sorted
    assert(read(us) === instants)
    assert(read(ns) === instants)
  }

  test("canary: live testdata physical types match loader assumptions") {
    // Expected LOGICAL schema per table as the raw loaders observe it.
    // If the driver regenerates testdata with different physical types,
    // THIS test names the drift. events is checked post-adaptation (the
    // loader's contract is TimestampType out, whichever physical type in).
    val expect: Map[String, Map[String, DataType]] = Map(
      "region"   -> Map("r_regionkey" -> IntegerType, "r_name" -> StringType),
      "nation"   -> Map("n_nationkey" -> IntegerType, "n_regionkey" -> IntegerType),
      "customer" -> Map("c_custkey" -> LongType, "c_nationkey" -> IntegerType,
        "c_acctbal" -> DoubleType),
      "supplier" -> Map("s_suppkey" -> LongType),
      "part"     -> Map("p_partkey" -> LongType, "p_retailprice" -> DoubleType),
      "orders"   -> Map("o_orderkey" -> LongType, "o_custkey" -> LongType,
        "o_totalprice" -> DoubleType, "o_orderdate" -> TimestampNTZType),
      "lineitem" -> Map("l_orderkey" -> LongType, "l_quantity" -> DoubleType,
        "l_extendedprice" -> DoubleType, "l_shipdate" -> TimestampNTZType),
      "documents"  -> Map("doc_id" -> LongType, "text" -> StringType,
        "source" -> StringType, "lang" -> StringType, "n_chars" -> LongType),
      "embeddings" -> Map("vec_id" -> LongType, "label" -> IntegerType,
        "embedding" -> ArrayType(FloatType, containsNull = true)),
      "events" -> Map("event_id" -> LongType, "user_id" -> LongType,
        "event_type" -> StringType, "value" -> DoubleType,
        "props" -> StringType, "ts" -> TimestampType)
    )
    val drift = for {
      (table, cols) <- expect.toSeq.sortBy(_._1)
      schema = Tables.raw(spark, sfDir, table).schema
      (c, want) <- cols.toSeq.sortBy(_._1)
      got = schema.find(_.name == c).map(_.dataType)
      if !got.contains(want)
    } yield s"$table.$c: expected $want, observed ${got.getOrElse("MISSING")}"
    assert(drift.isEmpty, s"\nTestdata drift detected:\n${drift.mkString("\n")}")
  }
}
