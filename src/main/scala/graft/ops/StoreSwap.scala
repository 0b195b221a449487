package graft.ops

import org.apache.spark.sql.SparkSession

/** The house swap for write-aside store rewrites: publish `path + ".next"`
  * at `path` without ever holding the only complete copy in a half-deleted
  * state. The naive delete-then-rename (the original q149 shape) has a
  * crash window in which the live directory is already gone and `.next`
  * has not yet been renamed — recovery exists (`.next` is complete) but a
  * reader during the window sees a MISSING store, and the window is
  * O(delete) = O(files) long. Rename-aside inverts the order:
  *
  *   1. `path`      -> `path + ".old"`   (metadata-only)
  *   2. `path.next` -> `path`            (metadata-only)
  *   3. delete `path + ".old"`           (slow part, AFTER publication)
  *
  * At every instant a complete copy of some store version exists on disk
  * under a well-known name, the unreadable window shrinks to two renames,
  * and crash recovery is mechanical by inspection: `.next` present and
  * `path` absent -> redo step 2; `.old` present and `path` present ->
  * redo step 3. A stale `.old` from a previous crash is cleared first so
  * step 1 cannot collide. On a real object store (no atomic rename) the
  * production analogue is write-new -> repoint -> retire, which this
  * sequence degrades to gracefully.
  */
object StoreSwap {

  /** Replace `path` with `path + ".next"` via rename-aside (see object
    * doc). Tolerates a missing live dir (first publication) and a stale
    * `.old` left by a prior crash.
    */
  def swapInto(spark: SparkSession, path: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val next = new org.apache.hadoop.fs.Path(path + ".next")
    val old = new org.apache.hadoop.fs.Path(path + ".old")
    val fs = p.getFileSystem(conf)
    fs.delete(old, true)
    val hadLive = fs.exists(p)
    if (hadLive && !fs.rename(p, old))
      throw new java.io.IOException(s"store swap: could not set aside $path")
    // FileSystem.rename signals failure BOTH ways depending on the
    // implementation — `false` on HDFS-style semantics, a thrown
    // IOException on e.g. RawLocalFileSystem when the source is missing —
    // so the publish guards against both.
    val published =
      try fs.rename(next, p)
      catch { case scala.util.control.NonFatal(_) => false }
    if (!published) {
      // Step 2 failed with the live copy already set aside: roll it back so
      // a transient rename failure never strands the store at `.old` (a
      // caller retry would otherwise find `path` missing and turn a blip
      // into an outage). If the rollback itself fails the message says
      // where the surviving copy is.
      if (hadLive && !fs.rename(old, p))
        throw new java.io.IOException(
          s"store swap: could not publish $path.next AND rollback failed — live copy is at $path.old")
      throw new java.io.IOException(s"store swap: could not publish $path.next (live store restored)")
    }
    fs.delete(old, true)
    ()
  }
}
