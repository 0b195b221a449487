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

object BloomExpressions {
  import org.apache.spark.sql.graft.{shims => S}

  /** true iff `hash` (a bigint column, e.g. an XXH64 shingle hash) might be
    * in `filter`; false is definitive absence.
    */
  def mightContainLong(hash: Column, filter: BloomFilter): Column =
    S.column(BloomMightContainLong(S.expression(hash), filter))
}
