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

  /** Symmetric int8 quantization audit of a float embedding — the
    * compression step that shrinks a 100 TB embedding store (and every
    * ANN shuffle over it) 4x, plus the error accounting that decides
    * whether the recall hit is acceptable. One pass, all-integer
    * outputs so both engines agree exactly:
    *   [0] n_dims
    *   [1] floor(maxabs * 1e6)         — the per-vector scale
    *   [2] Σ_i floor(|x_i - q_i*maxabs/127| * 1e9) — reconstruction err
    *   [3] count of |q_i| == 127       — saturated components
    * where q_i = floor(x_i*127/maxabs + 0.5) (floor(+0.5) instead of
    * round: Spark and DuckDB disagree on negative .5 ties; floor is
    * identical everywhere). maxabs is clamped to >= 1e-12 so the
    * zero vector quantizes to all-zeros instead of dividing by zero.
    * The Scala side accumulates the error terms in a Long (each term an
    * integer from floor(), so the sum is exact by construction); it is
    * the ORACLE's side (DuckDB list_sum over doubles) where exactness
    * needs the argument that each term is integer-valued and the total
    * stays below 2^53 — which holds for finite float32 inputs of
    * bounded magnitude (per-term err < maxabs, terms < 2^31 for
    * |x| < ~2.1e21; NaN/Inf components would break parity and are
    * absent from the embedding tables by construction). */
  def quantStats(a: ArrayData): ArrayData = {
    val n = a.numElements()
    var ma = 0.0
    var i = 0
    while (i < n) {
      val v = math.abs(if (a.isNullAt(i)) 0.0 else a.getFloat(i).toDouble)
      if (v > ma) ma = v
      i += 1
    }
    if (ma < 1e-12) ma = 1e-12
    var errN = 0L
    var sat = 0L
    i = 0
    while (i < n) {
      val x = if (a.isNullAt(i)) 0.0 else a.getFloat(i).toDouble
      val q = math.floor(x * 127.0 / ma + 0.5)
      if (q == 127.0 || q == -127.0) sat += 1
      errN += math.floor(math.abs(x - q * ma / 127.0) * 1e9).toLong
      i += 1
    }
    new GenericArrayData(Array[Any](
      n.toLong, math.floor(ma * 1e6).toLong, errN, sat))
  }

  def quantStatsCol(emb: Column): Column =
    Bridge.column(QuantStatsExpr(Bridge.expression(emb)))
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

/** [n_dims, maxabs_micro, err_nano_sum, n_saturated] — ARRAY<FLOAT> ->
  * ARRAY<LONG>(4) (see Vectors.quantStats). */
final case class QuantStatsExpr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"quantStats expects ARRAY<FLOAT>, got $other")
    }
  override def nullSafeEval(input: Any): Any =
    Vectors.quantStats(input.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Vectors.quantStats($c)")
  override protected def withNewChildInternal(c: Expression): QuantStatsExpr =
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
