package graft.ops

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, RandomAccessFile}
import java.nio.{ByteBuffer, ByteOrder}

import scala.jdk.CollectionConverters._

import org.apache.parquet.format.{FileMetaData, SortingColumn, Util}

/** Parquet `sorting_columns` footer metadata — closes the one writer-parity
  * gap vs the reference (SURVEY §4.3): pyarrow stamps
  * `SortingColumn(col, ascending)` into every row group
  * (`/root/reference/pyarrow/main.py:80,144`), and Spark's writer has no
  * public knob for it.
  *
  * `sorting_columns` is a field of each `RowGroup` struct INSIDE the thrift
  * footer — no data pages reference it — so stamping it is a pure
  * tail-of-file rewrite: deserialize the footer
  * (`org.apache.parquet.format.Util`, the same parquet-java shipped with
  * Spark), set the field, write footer + length + magic back. Data pages,
  * column chunk offsets, and page indexes are untouched (offsets are
  * absolute from file start, and the footer sits after all of them).
  *
  * Local-filesystem parity feature: in-place rewrite needs a seekable,
  * truncatable file. That matches the reference exactly — it also stamps a
  * LOCAL temp file before uploading (`pyarrow/main.py:137-150`). On an
  * object store you stamp before upload, same as the reference does.
  */
object SortingColumnsStamp {

  private val Magic = "PAR1".getBytes("US-ASCII")

  /** Stamp every row group of `file` with a single ascending/descending
    * sorting column. Returns false (file untouched) when the column is not a
    * leaf of the schema.
    */
  def stamp(
      file: String,
      sortCol: String,
      descending: Boolean = false,
      nullsFirst: Boolean = false): Boolean = {
    val raf = new RandomAccessFile(stripScheme(file), "rw")
    try {
      val (fmd, footerStart) = readFooter(raf)
      val idx = leafIndex(fmd, sortCol)
      if (idx < 0) false
      else {
        val sc = new SortingColumn(idx, descending, nullsFirst)
        fmd.getRow_groups.asScala.foreach(_.setSorting_columns(List(sc).asJava))
        val out = new ByteArrayOutputStream()
        Util.writeFileMetaData(fmd, out)
        val footer = out.toByteArray
        raf.seek(footerStart)
        raf.write(footer)
        val len = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
          .putInt(footer.length).array()
        raf.write(len)
        raf.write(Magic)
        raf.setLength(footerStart + footer.length + 8)
        true
      }
    } finally raf.close()
  }

  /** Read back the stamped metadata: (leafColumnPath, descending, nullsFirst)
    * per row group — for verification and tests.
    */
  def readSortingColumns(file: String): Seq[Seq[(String, Boolean, Boolean)]] = {
    val raf = new RandomAccessFile(stripScheme(file), "r")
    try {
      val (fmd, _) = readFooter(raf)
      val leaves = leafPaths(fmd)
      fmd.getRow_groups.asScala.toSeq.map { rg =>
        if (!rg.isSetSorting_columns) Seq.empty
        else rg.getSorting_columns.asScala.toSeq.map { sc =>
          (leaves(sc.getColumn_idx), sc.isDescending, sc.isNulls_first)
        }
      }
    } finally raf.close()
  }

  private def stripScheme(p: String): String =
    if (p.startsWith("file:")) p.stripPrefix("file:") else p

  private def readFooter(raf: RandomAccessFile): (FileMetaData, Long) = {
    val fileLen = raf.length()
    require(fileLen > 12, s"not a parquet file (len=$fileLen)")
    raf.seek(fileLen - 8)
    val tail = new Array[Byte](8)
    raf.readFully(tail)
    require(
      tail.slice(4, 8).sameElements(Magic),
      "missing PAR1 magic — not a (plain, unencrypted) parquet file")
    val footerLen =
      ByteBuffer.wrap(tail, 0, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
    val footerStart = fileLen - 8 - footerLen
    raf.seek(footerStart)
    val bytes = new Array[Byte](footerLen)
    raf.readFully(bytes)
    (Util.readFileMetaData(new ByteArrayInputStream(bytes)), footerStart)
  }

  /** Dotted paths of leaf columns in schema order — `SortingColumn.column_idx`
    * indexes this sequence. The thrift schema list is a depth-first preorder
    * walk with child counts; element 0 is the root.
    */
  private def leafPaths(fmd: FileMetaData): IndexedSeq[String] = {
    val els = fmd.getSchema.asScala.toIndexedSeq
    val leaves = IndexedSeq.newBuilder[String]
    // stack of (remaining children, path prefix)
    var stack = List((els.head.getNum_children, List.empty[String]))
    els.drop(1).foreach { el =>
      val (remaining, prefix) = stack.head
      stack = (remaining - 1, prefix) :: stack.tail
      val path = prefix :+ el.getName
      val kids = if (el.isSetNum_children) el.getNum_children else 0
      if (kids > 0) stack = (kids, path) :: stack
      else leaves += path.mkString(".")
      while (stack.nonEmpty && stack.head._1 == 0) stack = stack.tail
    }
    leaves.result()
  }

  private def leafIndex(fmd: FileMetaData, col: String): Int =
    leafPaths(fmd).indexOf(col)
}
