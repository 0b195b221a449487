package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Small-file compaction — the maintenance half of a streaming lake.
  *
  * The file-per-event convert stream ([[graft.streaming.ConvertStream]])
  * and frequent micro-batches produce many small parquet files; at 100 TB
  * that means scan tasks dominated by open/footer overhead and NameNode/
  * listing pressure. Compaction rewrites a directory into
  * ~`targetBytes`-sized files, re-sorted by `sortCol`, so both file count
  * and per-file ordering (row-group min/max pruning) are restored.
  *
  * The rewrite goes through a temp directory + atomic-ish swap so a
  * failure mid-compaction leaves the original directory untouched —
  * readers never observe a half-written mix. (On a real object store this
  * is where a table format's transaction log takes over; the temp-swap is
  * the filesystem-level equivalent.)
  */
object Compact {

  final case class CompactResult(filesBefore: Int, filesAfter: Int, rows: Long)

  def compact(
      spark: SparkSession,
      dir: String,
      sortCol: String = "time",
      targetBytes: Long = 128L * 1024 * 1024,
      codec: String = "zstd"): CompactResult = {
    require(targetBytes > 0, "targetBytes must be positive")
    val conf = spark.sparkContext.hadoopConfiguration
    val path = new Path(dir)
    val fs = path.getFileSystem(conf)

    val parts = fs.listStatus(path)
      .filter(s => s.getPath.getName.endsWith(".parquet"))
    val totalBytes = parts.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)

    val df = spark.read.parquet(dir)
    val sortable = df.columns.contains(sortCol)
    val arranged =
      if (sortable) df.repartitionByRange(nOut, col(sortCol)).sortWithinPartitions(col(sortCol))
      else df.coalesce(nOut)

    val tmp = dir.stripSuffix("/") + ".__compact__"
    arranged.write.mode("overwrite").option("compression", codec).parquet(tmp)
    val rows = spark.read.parquet(tmp).count()

    // swap: remove originals, move compacted files in, drop temp dir
    val bak = new Path(dir.stripSuffix("/") + ".__old__")
    if (fs.exists(bak)) fs.delete(bak, true)
    if (!fs.rename(path, bak))
      throw new IllegalStateException(s"could not move $dir aside for swap")
    if (!fs.rename(new Path(tmp), path)) {
      fs.rename(bak, path) // restore
      throw new IllegalStateException(s"could not move compacted files into $dir")
    }
    fs.delete(bak, true)

    val after = fs.listStatus(path).count(_.getPath.getName.endsWith(".parquet"))
    CompactResult(parts.length, after, rows)
  }
}
