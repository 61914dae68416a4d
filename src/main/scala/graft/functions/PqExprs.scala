package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Product-quantization kernels (Jégou et al. 2011; see
  * [[graft.pipeline.Similarity]]).
  *
  * Why an expression and not folded literals: the original encode path
  * folded the codebook into the plan as `least(struct(dist, code), ...)`
  * chains — nCode structs x m subspaces x subDim-long literal dots. At
  * m=4/nCode=16 that inflates one generated method past janino's 64 KB
  * limit and the WHOLE stage silently runs interpreted (the exact
  * pathology custom expressions exist to avoid). Here the codebook is a
  * plain `long[]` reference object: the generated code is ONE static
  * call per subspace, constant-size regardless of m/nCode/dim, and the
  * argmin is a tight primitive loop with no per-row allocation (the old
  * path also sliced the subvector per subspace — the offset parameter
  * reads the full embedding in place instead). */
object PqOps {

  /** Index of the codeword minimizing |x_sub - w|² = |x|² - 2·x·w + |w|²
    * over exact integers; ties break to the LOWEST code (the struct-least
    * convention of the literal-folded original). `flat` is nCode
    * codewords of length `sub`, row-major; `x` is read at [off, off+sub).
    */
  def argmin(x: ArrayData, flat: Array[Long], ww: Array[Long],
      off: Int, sub: Int): Int = {
    var xx = 0L
    var i = 0
    while (i < sub) { val v = x.getLong(off + i); xx += v * v; i += 1 }
    var best = 0
    var bestDist = Long.MaxValue
    var c = 0
    while (c < ww.length) {
      var dot = 0L
      var j = 0
      val base = c * sub
      while (j < sub) { dot += x.getLong(off + j) * flat(base + j); j += 1 }
      val d = xx - 2L * dot + ww(c)
      if (d < bestDist) { bestDist = d; best = c }
      c += 1
    }
    best
  }

  /** The assigned codeword's distance itself — the k-means objective
    * term ([[graft.pipeline.Similarity.pqQuantizationError]]). */
  def minDist(x: ArrayData, flat: Array[Long], ww: Array[Long],
      off: Int, sub: Int): Long = {
    var xx = 0L
    var i = 0
    while (i < sub) { val v = x.getLong(off + i); xx += v * v; i += 1 }
    var bestDist = Long.MaxValue
    var c = 0
    while (c < ww.length) {
      var dot = 0L
      var j = 0
      val base = c * sub
      while (j < sub) { dot += x.getLong(off + j) * flat(base + j); j += 1 }
      val d = xx - 2L * dot + ww(c)
      if (d < bestDist) bestDist = d
      c += 1
    }
    bestDist
  }

  /** Nearest-code assignment for one subspace of `emb` (read in place at
    * offset `off`, no slice). */
  def argminCol(emb: Column, codewords: Seq[IndexedSeq[Long]], off: Int): Column =
    Bridge.column(PqArgminExpr(Bridge.expression(emb),
      codewords.map(_.toList).toList, off, emitDist = false))

  /** Assigned-codeword distance for one subspace of `emb`. */
  def minDistCol(emb: Column, codewords: Seq[IndexedSeq[Long]], off: Int): Column =
    Bridge.column(PqArgminExpr(Bridge.expression(emb),
      codewords.map(_.toList).toList, off, emitDist = true))
}

/** ARRAY<LONG> -> INT code (or LONG distance when `emitDist`): nearest
  * codeword over one PQ subspace. The codebook rides as constructor DATA
  * (a codegen reference object), never as unrolled literals — generated
  * code is one static call, so whole-stage codegen stays under janino's
  * method limit at any (m, nCode, dim). */
final case class PqArgminExpr(
    child: Expression, codewords: List[List[Long]], off: Int,
    emitDist: Boolean) extends UnaryExpression {

  @transient private lazy val sub: Int = codewords.head.size
  @transient private lazy val flat: Array[Long] = {
    val a = new Array[Long](codewords.size * sub)
    var c = 0
    codewords.foreach { w =>
      var j = 0
      w.foreach { v => a(c * sub + j) = v; j += 1 }
      c += 1
    }
    a
  }
  @transient private lazy val ww: Array[Long] =
    codewords.map(w => w.map(x => x * x).sum).toArray

  override def dataType: DataType = if (emitDist) LongType else IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_argmin expects ARRAY<LONG>, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    if (emitDist) PqOps.minDist(x, flat, ww, off, sub)
    else PqOps.argmin(x, flat, ww, off, sub)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("pqFlat", flat, "long[]")
    val wwRef = ctx.addReferenceObj("pqWw", ww, "long[]")
    val m = if (emitDist) "minDist" else "argmin"
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PqOps.$m($c, $flatRef, $wwRef, $off, $sub)")
  }

  override protected def withNewChildInternal(c: Expression): PqArgminExpr =
    copy(child = c)
}
