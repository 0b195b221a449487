package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd single-pass vector similarity kernels.
  *
  * The higher-order-function formulation (`aggregate`/`zip_with`) is
  * interpreted (no `doGenCode` on HOFs) and walks each array three times
  * (dot, |a|, |b|). At ANN scale — millions of candidate pairs × wide
  * embeddings — that interpretation overhead dominates the query. These
  * expressions generate a primitive float loop inside whole-stage codegen:
  * one pass, three accumulators, no boxing.
  *
  * Accumulation is left-to-right in double (floats widened losslessly), so
  * results are bit-identical to the HOF version and to a sequential C
  * implementation — determinism is preserved for oracle comparison.
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType

  // array<tinyint> is accepted alongside float/double so the SAME kernels
  // serve asymmetric quantized scoring (float query × int8 corpus): bytes
  // widen to double losslessly, so mixing element types stays deterministic
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) | ArrayType(ByteType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double|tinyint> inputs, got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  protected def getter(e: Expression, arr: String, i: String): String =
    elemType(e) match {
      case DoubleType => s"$arr.getDouble($i)"
      case ByteType => s"(double) $arr.getByte($i)"
      case _ => s"(double) $arr.getFloat($i)"
    }

  protected def getElem(e: Expression, a: ArrayData, i: Int): Double =
    elemType(e) match {
      case DoubleType => a.getDouble(i)
      case ByteType => a.getByte(i).toDouble
      case _ => a.getFloat(i).toDouble
    }
}

/** cosine(a, b) = a·b / (|a|·|b|), one fused loop. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = getElem(left, a, i); val y = getElem(right, b, i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = ${getter(left, a, s"$i")};
         |  double $y = ${getter(right, b, s"$i")};
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Plain dot product, one loop. */
case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def prettyName: String = "dot_product"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += getElem(left, a, i) * getElem(right, b, i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += ${getter(left, a, s"$i")} * ${getter(right, b, s"$i")};
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Squared L2 distance, one loop. */
case class L2Squared(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def prettyName: String = "l2_squared"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = getElem(left, a, i) - getElem(right, b, i)
      s += d * d; i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = ${getter(left, a, s"$i")} - ${getter(right, b, s"$i")};
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Column-level wrappers around the codegen'd kernels. */
object VectorExpressions {
  import org.apache.spark.sql.graft.{shims => S}

  def cosineSim(a: Column, b: Column): Column =
    S.column(CosineSimilarity(S.expression(a), S.expression(b)))

  def dotProduct(a: Column, b: Column): Column =
    S.column(DotProduct(S.expression(a), S.expression(b)))

  def l2Squared(a: Column, b: Column): Column =
    S.column(L2Squared(S.expression(a), S.expression(b)))
}
