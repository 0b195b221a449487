package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable SpaceSaving summary: at most `capacity` tracked (token, count,
  * err) entries plus a `floor` — the largest count ever evicted. Invariants
  * maintained by every operation (update, merge, truncation):
  *   - for a tracked token with true frequency f:  count − err ≤ f ≤ count;
  *   - for an UNtracked token:                     f ≤ floor;
  *   - any token with f > N/capacity is tracked (classic SpaceSaving
  *     guarantee), so top-k-frequent queries with k ≪ capacity are safe.
  * While the summary has never overflowed (floor == 0, distinct values ≤
  * capacity) every count is EXACT — the regime the q63 oracle pins.
  *
  * The count-ordered TreeSet mirror makes the eviction path O(log m); the
  * common paths (tracked hit, not-full insert) are hash-map O(1).
  */
final class SpaceSavingBuffer(val capacity: Int) {
  val entries = mutable.HashMap.empty[UTF8String, (Long, Long)] // token -> (count, err)
  var floor: Long = 0L
  private implicit val ord: Ordering[(Long, UTF8String)] =
    new Ordering[(Long, UTF8String)] {
      def compare(a: (Long, UTF8String), b: (Long, UTF8String)): Int = {
        val c = java.lang.Long.compare(a._1, b._1)
        if (c != 0) c else a._2.compareTo(b._2)
      }
    }
  private val byCount = mutable.TreeSet.empty[(Long, UTF8String)]

  /** One observed occurrence of `token` (the streaming update path). */
  def add(token: UTF8String): Unit =
    entries.get(token) match {
      case Some((c, e)) =>
        byCount.remove((c, token))
        entries.update(token, (c + 1, e))
        byCount.add((c + 1, token))
      case None if entries.size < capacity =>
        // a token first seen now occurred at most `floor` times before
        // (untracked ⇒ f ≤ floor), so it enters carrying that uncertainty
        entries.update(token, (floor + 1, floor))
        byCount.add((floor + 1, token))
      case None =>
        val (cmin, tmin) = byCount.head
        byCount.remove((cmin, tmin))
        entries.remove(tmin)
        floor = math.max(floor, cmin)
        // the newcomer inherits the evicted minimum as its overestimate
        entries.update(token, (cmin + 1, cmin))
        byCount.add((cmin + 1, token))
    }

  /** Direct insert of a NOT-YET-TRACKED token with known (count, err) —
    * the merge/deserialize path; no floor charging, no eviction.
    */
  def addRaw(token: UTF8String, count: Long, err: Long): Unit = {
    entries.update(token, (count, err))
    byCount.add((count, token))
  }

  /** Keep the `capacity` largest entries (smallest count evicted first,
    * token-asc on count ties); dropped counts raise the floor — they
    * become "untracked with f ≤ floor", exactly what the invariant
    * requires.
    */
  def truncate(): Unit =
    while (entries.size > capacity) {
      val (cmin, tmin) = byCount.head
      byCount.remove((cmin, tmin))
      entries.remove(tmin)
      floor = math.max(floor, cmin)
    }

  /** (token, count, err) sorted by count desc then token asc. */
  def sorted: Seq[(UTF8String, Long, Long)] =
    entries.toSeq.map { case (t, (c, e)) => (t, c, e) }
      .sortWith((a, b) => a._2 > b._2 || (a._2 == b._2 && a._1.compareTo(b._1) < 0))
}

/** `top_k_frequent(expr, k, capacity)` — approximate heavy hitters: the k
  * most frequent string values of a group as
  * `array<struct<token, cnt, err>>` (count desc, token asc), from a
  * [[SpaceSavingBuffer]] of `capacity` counters.
  *
  * This is the vocabulary-building aggregate at 100 TB: exact term counting
  * (q43/q50) shuffles EVERY token occurrence; this ships one
  * `capacity`-bounded buffer per partition through the shuffle regardless
  * of corpus size — the same partial/merge shape as [[BottomKDistinct]],
  * with the SpaceSaving eviction rule instead of a distinct bottom-k. Pick
  * `capacity` ≥ a few × (N / smallest-frequency-of-interest); `err` in the
  * output is the per-token overestimate bound (0 ⇒ that count is exact).
  */
case class TopKFrequent(
    child: Expression,
    k: Int,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingBuffer] {

  require(k > 0, "k must be positive")
  require(capacity >= k, s"capacity ($capacity) must be >= k ($k)")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("token", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false),
      StructField("err", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "top_k_frequent"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"top_k_frequent requires a string input, got ${child.dataType}")

  override def createAggregationBuffer(): SpaceSavingBuffer =
    new SpaceSavingBuffer(capacity)

  override def update(buf: SpaceSavingBuffer, input: InternalRow): SpaceSavingBuffer = {
    val v = child.eval(input)
    if (v != null) {
      // UTF8String may point into a reused row buffer — copy before keeping
      buf.add(v.asInstanceOf[UTF8String].clone())
    }
    buf
  }

  /** Mergeable-summaries combine, built batch-wise into a fresh buffer so
    * mid-merge evictions can't pollute later charges: each union token is
    * charged, per side, its tracked (count, err) or that side's floor for
    * both (untracked ⇒ that side saw it at most floor times); floors add;
    * then one truncation back to `capacity`. In the never-overflowed
    * regime both floors are 0 and this is an exact count sum.
    */
  override def merge(buf: SpaceSavingBuffer, other: SpaceSavingBuffer): SpaceSavingBuffer = {
    if (other.entries.isEmpty && other.floor == 0L) return buf
    if (buf.entries.isEmpty && buf.floor == 0L) return other
    val merged = new SpaceSavingBuffer(capacity)
    merged.floor = buf.floor + other.floor
    (buf.entries.keySet ++ other.entries.keySet).foreach { t =>
      val (c1, e1) = buf.entries.getOrElse(t, (buf.floor, buf.floor))
      val (c2, e2) = other.entries.getOrElse(t, (other.floor, other.floor))
      merged.addRaw(t, c1 + c2, e1 + e2)
    }
    merged.truncate()
    merged
  }

  override def eval(buf: SpaceSavingBuffer): Any =
    new GenericArrayData(buf.sorted.take(k).map { case (t, c, e) =>
      new GenericInternalRow(Array[Any](t, c, e))
    }.toArray[Any])

  override def serialize(buf: SpaceSavingBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.entries.size)
    out.writeLong(buf.floor)
    buf.entries.foreach { case (t, (c, e)) =>
      val b = t.getBytes
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
      out.writeLong(e)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new SpaceSavingBuffer(capacity)
    buf.floor = in.readLong()
    var i = 0
    while (i < n) {
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      buf.addRaw(UTF8String.fromBytes(b), in.readLong(), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKFrequent =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKFrequent =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKFrequent =
    copy(child = newChildren.head)
}

object SpaceSavingExpressions {

  /** Column API: top-k heavy hitters of a string column as a sorted
    * `array<struct<token, cnt, err>>`.
    */
  def topKFrequent(c: Column, k: Int, capacity: Int): Column =
    shims.column(TopKFrequent(shims.expression(c), k, capacity).toAggregateExpression())
}
