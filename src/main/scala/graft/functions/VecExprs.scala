package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Codegen'd vector primitives for similarity search.
  *
  * The HOF formulation `aggregate(zip_with(a, b, _*_), 0L, _+_)` is
  * interpreted (CodegenFallback) and allocates a zipped array per pair —
  * on an all-pairs cosine join the dot product IS the workload, so it
  * must be one tight loop. Quantized embeddings are long arrays; the
  * integer dot is exact and order-independent (see Similarity scaladoc).
  */
object Vectors {
  /** Integer dot product of two equal-length long arrays. */
  def dotLong(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }

  def dotCol(a: Column, b: Column): Column =
    Bridge.column(DotLongExpr(Bridge.expression(a), Bridge.expression(b)))

  /** Quantize a float/double embedding to exact 64-bit components:
    * floor(double(x) * 1e6). One pass; bit-identical to the HOF
    * formulation `transform(emb, x -> floor(x*1e6)::long)` (which is
    * CodegenFallback — interpreted per element). */
  def quantizeFloat(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i))
        out(i) = java.lang.Long.valueOf(
          math.floor(a.getFloat(i).toDouble * 1000000.0).toLong)
      i += 1
    }
    new GenericArrayData(out)
  }

  def quantizeDouble(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i))
        out(i) = java.lang.Long.valueOf(
          math.floor(a.getDouble(i) * 1000000.0).toLong)
      i += 1
    }
    new GenericArrayData(out)
  }

  def quantizeCol(emb: Column): Column =
    Bridge.column(QuantizeExpr(Bridge.expression(emb)))
}

/** floor(x*1e6) per element — ARRAY<FLOAT|DOUBLE> -> ARRAY<LONG>. */
final case class QuantizeExpr(child: Expression)
    extends UnaryExpression {
  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override def dataType: DataType = ArrayType(LongType,
    containsNull = child.dataType.asInstanceOf[ArrayType].containsNull)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"quantize expects ARRAY<FLOAT|DOUBLE>, got $other")
    }
  override def nullSafeEval(input: Any): Any =
    if (isFloat) Vectors.quantizeFloat(input.asInstanceOf[ArrayData])
    else Vectors.quantizeDouble(input.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = if (isFloat) "quantizeFloat" else "quantizeDouble"
    defineCodeGen(ctx, ev, c => s"graft.functions.Vectors.$m($c)")
  }
  override protected def withNewChildInternal(c: Expression): QuantizeExpr =
    copy(child = c)
}

final case class DotLongExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    Vectors.dotLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.Vectors.dotLong($a, $b)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): DotLongExpr = copy(left = l, right = r)
}
