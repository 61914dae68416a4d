package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

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
