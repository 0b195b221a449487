package graft.queries

import org.apache.spark.sql.SparkSession

/** Content-keyed warm-store policy, shared by every persisted-artifact
  * helper in the query registry (band/exact/component indexes, the n-gram
  * and histogram stores, the release-manifest chain, the media and
  * cross-modal index families, the IVF/PQ vector indexes).
  *
  * History: these helpers originally allowed cross-call reuse ONLY for
  * the read-only driver testdata dirs — any other dir rebuilt its store
  * on every invocation, because a user dir rewritten mid-session must
  * never serve a stale artifact. Correct, but it made the REGISTERED
  * query forms recompute corpus-scale upstream chains per call on any
  * non-testdata corpus: the round-15 sf1 rehearsal measured the
  * takedown/forget tier at 46-82x on 10x data purely from per-invocation
  * chain rebuilds (q171/q176/q177 re-deriving the ~24 s incremental
  * release, q188 re-building four media store families), while the
  * probes themselves are O(batch). At 100 TB a store that cannot be
  * warm-served is not a store.
  *
  * The fix is the [[Similarity.momentStoreFor]] staleness rule
  * generalized: key the artifact path by the CONTENT that built it, then
  * reuse becomes safe for any dir. For non-testdata dirs the tag is a
  * hash of every underlying parquet file's (name, size, mtime) for the
  * input tables — O(file-listing), no data scan — so a rewritten corpus
  * re-keys to a fresh path instead of being trusted, and two dirs with
  * different bytes can never share an artifact. The driver testdata is
  * immutable by contract and keeps the historical constant (empty) tag:
  * paths, I/O, and bench behavior there are byte-identical to the old
  * policy.
  */
private[queries] object WarmStores {

  /** Content tag for `dir`, derived from the named top-level tables
    * (e.g. "documents", "embeddings"). "" for the driver testdata
    * (immutable; zero I/O). A missing table contributes nothing —
    * callers name the tables their store is a function of.
    */
  def dirTag(s: SparkSession, dir: String, tables: String*): String =
    if (dir.startsWith("/root/testdata")) ""
    else {
      val conf = s.sparkContext.hadoopConfiguration
      var acc = 1125899906842597L
      tables.sorted.foreach { t =>
        val p = new org.apache.hadoop.fs.Path(s"$dir/$t.parquet")
        val fs = p.getFileSystem(conf)
        if (fs.exists(p)) {
          val it = fs.listFiles(p, true)
          val entries = scala.collection.mutable.ArrayBuffer.empty[String]
          while (it.hasNext) {
            val f = it.next()
            entries += s"${f.getPath.getName}:${f.getLen}:${f.getModificationTime}"
          }
          entries.sorted.foreach(e => acc = acc * 1000003L + e.hashCode)
        }
      }
      "_" + java.lang.Long.toHexString(acc)
    }

  /** The reuse test every helper shares: every named success marker
    * exists under the content-keyed `path`. With the tag in the path,
    * existence IS validity — no dir-prefix check remains.
    */
  def ready(path: String, markers: String*): Boolean = {
    val ms = if (markers.isEmpty) Seq("_SUCCESS") else markers
    ms.forall(m => java.nio.file.Files.exists(java.nio.file.Paths.get(path, m)))
  }
}
