package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Testdata table loaders (`/root/testdata/sf&#42;/&lt;name&gt;.parquet`).
  *
  * `events.ts` is written as Parquet TIMESTAMP(NANOS) which Spark's vectorized
  * reader rejects ([PARQUET_TYPE_ILLEGAL]); we read it as raw nanos via
  * `spark.sql.legacy.parquet.nanosAsLong` and convert with exact integer
  * division (`DIV 1000`, never double division — epoch-ns overflows the 53-bit
  * double mantissa) to µs TimestampType.
  */
object Tables {

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    name match {
      case "events" => events(spark, dir)
      case _        => spark.read.parquet(s"$dir/$name.parquet")
    }

  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read
      .parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }
}
