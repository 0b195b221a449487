package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain_long(hash)` — membership probe of a pre-built
  * [[BloomFilter]] from inside whole-stage codegen.
  *
  * Why an expression and not a join: a decontamination / blocklist check
  * against a LARGE reference set (full eval-benchmark shingle inventories,
  * url blocklists) can't broadcast the exact set — but a Bloom summary of
  * it is fixed-size (×10⁶ smaller), rides the task binary to every
  * executor once, and turns the first membership pass into a shuffle-free
  * codegen'd `filter`. One-sided error means a downstream EXACT verify
  * join is still required for the survivors — but that join's input is now
  * the candidate subset, not the corpus (see
  * [[graft.queries.Curation.bloomDecontam]]).
  *
  * The filter object is embedded in the expression (Spark's
  * `BloomFilterImpl` is `Serializable`); codegen pins it via
  * `addReferenceObj`, so the probe is a branch-free virtual call per row —
  * no per-row deserialization, no UDF boxing.
  */
case class BloomMightContainLong(child: Expression, filter: BloomFilter)
    extends UnaryExpression {

  override def prettyName: String = "bloom_might_contain_long"
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", filter,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** SQL-surface twin of [[BloomMightContainLong]]:
  * `bloom_might_contain_long(filter_bytes, hash)` where `filter_bytes` is a
  * FOLDABLE binary expression holding the serialized filter
  * ([[BloomExpressions.serialize]] / `BloomFilter.writeTo`). The bytes fold
  * once per plan on the driver (lazy deserialize); per row it's the same
  * branch-free probe as the object-embedding form. This is what makes the
  * probe usable from pure SQL via [[graft.GraftExtensions]] — pass the
  * serialized filter as a parameter/literal.
  */
case class BloomMightContainBytes(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def prettyName: String = "bloom_might_contain_long"
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) if left.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName filter bytes must be foldable (a literal/parameter)")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, bigint), got (${l.simpleString}, ${r.simpleString})")
    }

  @transient private lazy val filter: BloomFilter = {
    // folded once per plan; a null here means the caller's literal was bad
    // (e.g. unhex of invalid hex) — fail with the cause, not an NPE
    val bytes = left.eval().asInstanceOf[Array[Byte]]
    require(bytes != null, s"$prettyName: filter bytes evaluated to null " +
      "(invalid serialized filter literal?)")
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  override def nullSafeEval(bytes: Any, hash: Any): Any =
    filter.mightContainLong(hash.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (_, h) => s"${ev.value} = $ref.mightContainLong($h);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object BloomExpressions {
  import org.apache.spark.sql.graft.{shims => S}

  /** true iff `hash` (a bigint column, e.g. an XXH64 shingle hash) might be
    * in `filter`; false is definitive absence.
    */
  def mightContainLong(hash: Column, filter: BloomFilter): Column =
    S.column(BloomMightContainLong(S.expression(hash), filter))

  /** The filter's wire form for the SQL surface / persistence. */
  def serialize(filter: BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    filter.writeTo(out)
    out.toByteArray
  }
}
