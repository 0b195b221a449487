package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.{DtCoercion, SchemaJson, SortedWrite}

/** The reference's whole pipeline as one batch job: gzipped-NDJSON in,
  * schema inferred, deep `_dt` coercion, global sort, tuned Parquet out.
  *
  * Maps `convert_object_to_parquet` (`/root/reference/pyarrow/main.py:94-169`)
  * onto a single declarative Spark plan:
  * `FileScan json → Project(coercion) → Exchange rangepartitioning(sort) →
  * Sort → InsertIntoHadoopFsRelation(parquet)`.
  *
  * The reference's S3-event entry (`pyarrow/main.py:18-50`) collapses to path
  * arguments: `srcPath` is any path/glob `spark.read.json` accepts (`.gz`
  * decompresses transparently; NDJSON is the default line mode). Destination
  * key mapping (`pyarrow/main.py:119-133`): key stem + `.zst.parquet` /
  * `.gz.parquet`, via [[destName]].
  */
object ConvertJob {

  final case class ConvertResult(
      outputPath: String,
      rows: Long,
      sorted: Boolean,
      codec: String,
      originalSchema: String,
      updatedSchema: String,
      coercedFields: Seq[String]) {

    /** Structured-log line — parity with `pyarrow/main.py:152-165`. */
    def logJson: String =
      s"""{"message": "Conversion complete", "rows_written": $rows, """ +
        s""""compression": "$codec", "sorted": $sorted, """ +
        s""""original_schema": $originalSchema, "updated_schema": $updatedSchema}"""
  }

  /** Destination file name for a source object key: stem before the first
    * dot + codec-tagged parquet suffix (`pyarrow/main.py:119-133`).
    */
  def destName(srcKey: String, codec: String = "zstd"): String = {
    val stem = srcKey.split("\\.", 2)(0)
    val tag = if (codec == "gzip") "gz" else "zst"
    s"$stem.$tag.parquet"
  }

  /** Parse-mode parity: `paj.read_json` RAISES on a malformed NDJSON line
    * (`/root/reference/pyarrow/main.py:59`, default ParseOptions), while
    * Spark's default PERMISSIVE mode silently nulls the row and pollutes
    * the inferred schema with `_corrupt_record`. FAILFAST reproduces the
    * reference's raise; pass `parseMode = "PERMISSIVE"` explicitly to opt
    * into Spark's lenient behavior.
    */
  val DefaultParseMode = "FAILFAST"

  private def readNdjson(spark: SparkSession, srcPath: String, parseMode: String) =
    spark.read.option("mode", parseMode).json(srcPath)

  /** Read NDJSON → coerce `_dt` → sort → write parquet. */
  def run(
      spark: SparkSession,
      srcPath: String,
      outPath: String,
      sortCol: String = "time",
      codec: String = "zstd",
      strict: Boolean = false,
      singleFile: Boolean = false,
      parseMode: String = DefaultParseMode): ConvertResult = {

    val raw = readNdjson(spark, srcPath, parseMode)
    runOn(raw, outPath, sortCol, codec, strict, singleFile)
  }

  /** Scale-path variant: same read → coerce chain, but the output is a
    * DATE-PARTITIONED parquet lake (`date=yyyy-MM-dd/` directories derived
    * from the epoch-ms sort column) instead of one globally-sorted file.
    * Rows stay sorted by `sortCol` within every file; readers filtering on
    * `date` get planning-time partition pruning. This is how the same
    * conversion runs over 100 TB of findings: parallel writes, no
    * `coalesce(1)`, no global range exchange.
    */
  def runPartitionedByDate(
      spark: SparkSession,
      srcPath: String,
      outPath: String,
      sortCol: String = "time",
      codec: String = "zstd",
      strict: Boolean = false,
      parseMode: String = DefaultParseMode,
      dateCol: String = "date"): ConvertResult = {
    import org.apache.spark.sql.functions.{col, date_add, date_format, floor, lit, to_date}
    val raw = readNdjson(spark, srcPath, parseMode)
    val original = raw.schema
    val coerced = DtCoercion.coerceDtFields(raw, strict)
    require(coerced.columns.contains(sortCol),
      s"date partitioning needs the epoch-ms column '$sortCol'")
    // never clobber source data: the derived partition column must not
    // shadow an existing field (rename via dateCol when the input has one)
    require(!coerced.columns.contains(dateCol),
      s"input already has a '$dateCol' column; pass a different dateCol")
    // UTC day via pure epoch arithmetic — date_format(timestamp_millis(...))
    // renders in spark.sql.session.timeZone, so the same input would produce
    // DIFFERENT lake layouts (and pruning results) on clusters with
    // different session zones. floor handles pre-1970 epochs correctly.
    val epochDay = floor(col(sortCol) / lit(86400000L)).cast("int")
    val dated = coerced.withColumn(dateCol,
      date_format(date_add(to_date(lit("1970-01-01")), epochDay), "yyyy-MM-dd"))
    val res = SortedWrite.writePartitioned(dated, outPath, Seq(dateCol), sortCol, codec)
    result(original, coerced.schema, res)
  }

  private def result(
      original: org.apache.spark.sql.types.StructType,
      updated: org.apache.spark.sql.types.StructType,
      res: SortedWrite.WriteResult): ConvertResult =
    ConvertResult(
      outputPath = res.path,
      rows = res.rows,
      sorted = res.sorted,
      codec = res.codec,
      originalSchema = SchemaJson.render(original),
      updatedSchema = SchemaJson.render(updated),
      coercedFields = DtCoercion.hitPaths(original))

  /** Same pipeline over an already-loaded DataFrame (for tests / streaming). */
  def runOn(
      raw: DataFrame,
      outPath: String,
      sortCol: String = "time",
      codec: String = "zstd",
      strict: Boolean = false,
      singleFile: Boolean = false): ConvertResult = {

    val original = raw.schema
    val coerced = DtCoercion.coerceDtFields(raw, strict)
    val res = SortedWrite.write(coerced, outPath, sortCol, codec, singleFile)
    result(original, coerced.schema, res)
  }
}
