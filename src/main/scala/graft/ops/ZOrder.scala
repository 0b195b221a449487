package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-dimensional data-skipping.
  *
  * A linear sort clusters ONE column: files get narrow min/max ranges on
  * the sort key and full-width ranges on everything else, so parquet
  * row-group/file skipping only helps filters on that key. Interleaving
  * the bits of two keys and sorting by the interleaved value gives every
  * file a narrow range on BOTH columns (each ~√(files) of the domain) —
  * the standard lake-layout answer to "we filter by user AND by time".
  *
  * The z-value is a pure codegen Column expression (rank-normalize each
  * key to `bits` fixed-point bits, then interleave); the write is an
  * ordinary range-partitioned sort on it. Min/max normalization bounds
  * come from one aggregate pass — at 100 TB those are metastore stats or
  * a sample, not a full scan.
  */
object ZOrder {

  /** Bit-interleaved (Morton) value of two already-normalized non-negative
    * ints in [0, 2^bits): bit i of `a` lands at 2i, bit i of `b` at 2i+1.
    */
  def interleave(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).map { i =>
      val abit = shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
      val bbit = shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1)
      abit.bitwiseOR(bbit)
    }.reduce((x, y) => x.bitwiseOR(y))
  }

  /** Fixed-point normalization of a numeric column to [0, 2^bits) given
    * domain [lo, hi] (constant fold — lo/hi are plan-time literals).
    */
  def normalize(c: Column, lo: Double, hi: Double, bits: Int = 16): Column = {
    val span = math.max(hi - lo, java.lang.Double.MIN_NORMAL)
    val maxV = (1L << bits) - 1
    least(lit(maxV), greatest(lit(0L),
      floor((c.cast("double") - lit(lo)) / span * maxV).cast("long")))
  }

  /** Z-value for two numeric columns; domain bounds from one agg pass.
    * None when bounds are unavailable (empty input, or all-null /
    * non-castable columns) — callers fall back to an unclustered write
    * rather than NPE-ing on a null min/max.
    */
  def zValueOf(df: DataFrame, colA: String, colB: String, bits: Int = 16): Option[Column] = {
    val r = df.agg(
      min(col(colA)).cast("double"), max(col(colA)).cast("double"),
      min(col(colB)).cast("double"), max(col(colB)).cast("double")).head
    if ((0 until 4).exists(r.isNullAt)) None
    else Some(interleave(
      normalize(col(colA), r.getDouble(0), r.getDouble(1), bits),
      normalize(col(colB), r.getDouble(2), r.getDouble(3), bits),
      bits))
  }

  /** Write `df` parquet, z-order-clustered on (colA, colB). `maxRecordsPerFile`
    * bounds file size so min/max stats stay selective.
    */
  def writeClustered(
      df: DataFrame,
      outPath: String,
      colA: String,
      colB: String,
      maxRecordsPerFile: Int = 0,
      codec: String = "zstd"): Unit = {
    require(!df.columns.contains("__z"), "input already has a '__z' column")
    val arranged = zValueOf(df, colA, colB) match {
      case Some(z) =>
        // orderBy on the dropped column survives as the write ordering
        // because drop projects AFTER the sort in the same plan
        df.withColumn("__z", z).orderBy(col("__z")).drop("__z")
      case None => df // empty / all-null bounds: nothing to cluster
    }
    SortedWrite.withMaxRecords(
      arranged.write.mode("overwrite").option("compression", codec),
      maxRecordsPerFile.toLong)
      .parquet(outPath)
  }
}
