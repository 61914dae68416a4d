package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Second-moment (Gram) matrix of an integer vector column as ONE
  * mergeable Catalyst aggregate — the covariance pass of distributed PCA.
  *
  * The declarative alternative (double posexplode → groupBy (i, j) →
  * sum) materializes dim² rows per vector before partial aggregation
  * collapses them; at 100 TB that is a dim²-fold row amplification
  * through the hot stage. Here each task folds its vectors into a
  * FIXED dim(dim+1)/2-long upper-triangle buffer (dim=65 → 2 145 longs,
  * ~17 KB) and partials combine element-wise map-side, so the shuffle
  * carries one bounded buffer per task no matter the corpus size — the
  * same contract as [[CmsAggExpr]]/HLL (graft.pipeline.Sketch).
  *
  * Inputs are quantized embeddings (exact longs, see
  * [[Vectors.quantizeCol]]) so products and sums are exact integer math:
  * order-independent under any partitioning, and bit-for-bit replayable
  * by the DuckDB oracle. Callers append a constant-1 component
  * (`concat(q, array(lit(1L)))`): the augmented Gram's last column is
  * then the per-dimension sums and its corner the row count — mean,
  * centering, and covariance all fall out of ONE distributed pass
  * (see graft.pipeline.Pca for the algebra).
  */
object Gram {

  /** Upper-triangle (i <= j) aggregate of `vec vecᵀ` summed over rows,
    * laid out row-major: entry (i, j) at `i*dim - i*(i-1)/2 + (j-i)`. */
  def agg(vec: Column, dim: Int): Column =
    Bridge.column(GramAggExpr(Bridge.expression(vec), dim)
      .toAggregateExpression())

  def triIndex(i: Int, j: Int, dim: Int): Int =
    i * dim - i * (i - 1) / 2 + (j - i)

  /** Unpack the upper-triangle array into a full symmetric matrix. */
  def unpack(tri: Array[Long], dim: Int): Array[Array[Long]] = {
    val m = Array.ofDim[Long](dim, dim)
    var k = 0
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        m(i)(j) = tri(k); m(j)(i) = tri(k); k += 1; j += 1
      }
      i += 1
    }
    m
  }
}

final case class GramAggExpr(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType, containsNull = true))
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](dim * (dim + 1) / 2)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val a = child.eval(input)
    if (a != null) {
      val arr = a.asInstanceOf[ArrayData]
      // a short row contributes only its available prefix — no OOB; the
      // catalog always feeds fixed-width vectors so d == dim in practice
      val d = math.min(dim, arr.numElements())
      var k = 0
      var i = 0
      while (i < d) {
        val vi = arr.getLong(i)
        var j = i
        while (j < d) {
          buf(k + (j - i)) += vi * arr.getLong(j)
          j += 1
        }
        // advance k past row i of the dim-wide triangle, not the d-wide
        // one, so (i, j) always lands at the canonical triIndex slot
        k += dim - i
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(l => l: Any))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(offset: Int): GramAggExpr =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): GramAggExpr =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): GramAggExpr = copy(child = cs.head)
}
