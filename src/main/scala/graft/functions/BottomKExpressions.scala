package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `bottom_k_distinct(expr, k)` — the k lexicographically smallest DISTINCT
  * string values of a group, as a sorted array.
  *
  * This is the engine's custom-AGGREGATE surface (a
  * [[TypedImperativeAggregate]] with an explicit serialized buffer — the
  * machinery scalar codegen `Expression`s don't exercise), and the core of
  * a KMV ("k minimum values") sketch: applied to uniform hashes of a
  * column, the k-th smallest hash estimates distinct cardinality as
  * `(k-1) / normalized(kth)`, the bottom-k set is a deterministic uniform
  * group sample, and two sketches union by merging bottom-k sets — exactly
  * the `merge` path below, which is what makes it distributable: partial
  * sketches of size ≤ k flow through the shuffle, never the values.
  *
  * Determinism: unlike reservoir sampling (order-dependent, so retries can
  * change results), bottom-k of a deterministic function is independent of
  * partitioning and arrival order — the same invariant Salting and the
  * split assignment (q49) maintain.
  */
case class BottomKDistinct(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[UTF8String]] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bottom_k_distinct"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bottom_k_distinct requires a string input, got ${child.dataType}")

  override def createAggregationBuffer(): mutable.TreeSet[UTF8String] =
    mutable.TreeSet.empty[UTF8String]

  override def update(
      buf: mutable.TreeSet[UTF8String],
      input: InternalRow): mutable.TreeSet[UTF8String] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      // worth inserting only if below capacity or smaller than the current max
      if (buf.size < k || s.compareTo(buf.last) < 0) {
        // UTF8String may point into a reused row buffer — copy before keeping
        buf.add(s.clone())
        if (buf.size > k) buf.remove(buf.last)
      }
    }
    buf
  }

  override def merge(
      buf: mutable.TreeSet[UTF8String],
      other: mutable.TreeSet[UTF8String]): mutable.TreeSet[UTF8String] = {
    other.foreach { s =>
      if (buf.size < k || s.compareTo(buf.last) < 0) {
        buf.add(s)
        if (buf.size > k) buf.remove(buf.last)
      }
    }
    buf
  }

  override def eval(buf: mutable.TreeSet[UTF8String]): Any =
    new GenericArrayData(buf.toArray[Any])

  override def serialize(buf: mutable.TreeSet[UTF8String]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { s =>
      val b = s.getBytes
      out.writeInt(b.length)
      out.write(b)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[UTF8String] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.TreeSet.empty[UTF8String]
    var i = 0
    while (i < n) {
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      buf.add(UTF8String.fromBytes(b))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomKDistinct =
    copy(child = newChildren.head)
}

object BottomKExpressions {

  /** Column API: sorted array of the k smallest distinct string values. */
  def bottomKDistinct(c: Column, k: Int): Column =
    shims.column(BottomKDistinct(shims.expression(c), k).toAggregateExpression())

  /** KMV distinct-cardinality estimate from a bottom-k of md5-hex hashes:
    * `(k-1) / fraction-of-hash-space-below-kth`. Plain Column arithmetic
    * over the sketch output. 13 hex chars = 52 uniform bits — the widest
    * prefix a double mantissa (53 bits) represents exactly; wider prefixes
    * would silently round and break the exactness invariant.
    */
  def kmvEstimate(sketch: Column, k: Int): Column = {
    import org.apache.spark.sql.functions._
    val kth = element_at(sketch, k)
    val frac = conv(substring(kth, 1, 13), 16, 10).cast("double") / math.pow(16.0, 13)
    when(size(sketch) < k, size(sketch).cast("double"))
      .otherwise(lit((k - 1).toDouble) / frac)
  }
}
