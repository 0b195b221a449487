package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.pipeline.ConvertJob

/** Streaming form of the reference pipeline (SURVEY §2.8): the reference is
  * event-driven micro-batching at FILE granularity — one S3 `ObjectCreated`
  * event = one Lambda invoke = one file converted
  * (`/root/reference/pyarrow/main.py:18-50`). The Spark-native equivalent is
  * a Structured Streaming file source watching a directory: each newly
  * arriving NDJSON file is picked up by a micro-batch; `foreachBatch` groups
  * rows by `input_file_name()` and runs the SAME batch pipeline
  * ([[ConvertJob.runOn]]) per file, writing `<stem>.zst.parquet` per input —
  * byte-compatible outputs with the batch path.
  *
  * The pipeline is stateless by construction (each file independent), so no
  * watermarks or state stores are needed — exactly like the reference.
  * `Trigger.AvailableNow` drains the backlog then stops; pass a processing
  * trigger for continuous watching.
  */
object ConvertStream {

  /** Start watching `srcDir` for NDJSON(.gz) files; convert each arriving
    * file to `outDir/<stem>.zst.parquet`.
    *
    * @param schema    required by streaming file sources (no inference mid-
    *                  stream); derive once via `spark.read.json(sample).schema`
    * @param parseMode FAILFAST by default for batch-path parity
    *                  ([[ConvertJob.DefaultParseMode]]): a malformed line
    *                  fails its micro-batch instead of silently becoming an
    *                  all-null row
    */
  def start(
      spark: SparkSession,
      srcDir: String,
      outDir: String,
      schema: StructType,
      sortCol: String = "time",
      codec: String = "zstd",
      checkpoint: Option[String] = None,
      trigger: Trigger = Trigger.AvailableNow(),
      parseMode: String = ConvertJob.DefaultParseMode): StreamingQuery = {

    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "16")
      .option("mode", parseMode)
      .json(srcDir)
      .withColumn("__src_file", input_file_name())

    stream.writeStream
      .trigger(trigger)
      .option("checkpointLocation",
        checkpoint.getOrElse(s"$outDir/__checkpoint__"))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val files = batch.select("__src_file").distinct().collect().map(_.getString(0))
        files.foreach { f =>
          // input_file_name() yields a percent-encoded URI: decode before
          // deriving the stem, or "my data.ndjson.gz" writes "my%20data..."
          val decoded = new java.net.URI(f).getPath
          val stem = decoded.split("/").last.split("\\.", 2)(0)
          val one = batch.filter(col("__src_file") === f).drop("__src_file")
          ConvertJob.runOn(
            one,
            s"$outDir/${ConvertJob.destName(stem, codec)}",
            sortCol = sortCol,
            codec = codec,
            singleFile = true)
        }
        ()
      }
      .start()
  }
}
