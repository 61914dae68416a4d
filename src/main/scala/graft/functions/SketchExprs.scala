package graft.functions

import java.nio.ByteBuffer
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch as a custom mergeable Catalyst aggregate.
  *
  * Heavy-hitter counting at 100 TB: exact per-key counts shuffle every
  * distinct key; the CMS reduces each partition to a FIXED depth x width
  * counter grid map-side (partial aggregation — the grids add
  * element-wise), so the shuffle carries depth*width longs per partition
  * no matter how many distinct keys exist. Point estimates read
  * min over d of grid[d][hash_d(key) % width] — an overestimate with
  * error <= 2N/width at confidence 1 - (1/2)^depth (Cormode-Muthukrishnan,
  * "An improved data stream summary: the count-min sketch and its
  * applications", J. Algorithms 2005). Two datasets' sketches union by
  * element-wise add — the cross-corpus accounting primitive, same as
  * the HLL's per-bucket max (graft.pipeline.Sketch).
  *
  * The row hash is md5-derived (`hash_d(key)` = first 48 bits of
  * md5("cms<d>:" || key)) — deterministic and reproduced bit-for-bit by
  * the DuckDB oracle, the same portability convention as every other
  * signature in this repo. A TypedImperativeAggregate (not an
  * Aggregator/UDAF) keeps the buffer a raw long array with no
  * per-row encoder round-trips, and partial aggregation works the
  * standard way: update map-side, serialize, merge reduce-side.
  */
object Cms {

  // per-row digest reuse: MessageDigest is stateful (not thread-safe),
  // so keep one per executor thread; `reset()` between rows is implicit
  // in digest(). The per-depth "cms<d>:" prefixes are likewise hashed on
  // every row — precompute their UTF-8 bytes once (depths in practice
  // are single digits; grow lazily if a wider sketch asks).
  private val localMd = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }
  @volatile private var prefixes: Array[Array[Byte]] =
    (0 until 8).map(d => s"cms$d:".getBytes("UTF-8")).toArray

  private def prefix(d: Int): Array[Byte] = {
    var p = prefixes
    if (d >= p.length) synchronized {
      p = prefixes
      if (d >= p.length) {
        prefixes = (0 to d).map(i => s"cms$i:".getBytes("UTF-8")).toArray
        p = prefixes
      }
    }
    p(d)
  }

  /** hash_d(key): first 6 md5 bytes of "cms<d>:<key>" as an unsigned
    * 48-bit big-endian integer — equals
    * `conv(substring(md5(concat('cms<d>:', key)), 1, 12), 16, 10)`. */
  def hash48(d: Int, key: UTF8String): Long = {
    val md = localMd.get()
    md.reset()
    md.update(prefix(d))
    md.update(key.getBytes)
    val h = md.digest()
    ((h(0) & 0xffL) << 40) | ((h(1) & 0xffL) << 32) |
      ((h(2) & 0xffL) << 24) | ((h(3) & 0xffL) << 16) |
      ((h(4) & 0xffL) << 8) | (h(5) & 0xffL)
  }

  /** The full sketch of a string key column, as ARRAY<LONG> of length
    * depth*width laid out row-major: grid[d][b] = sketch[d*width + b]. */
  def sketch(key: Column, depth: Int = 4, width: Int = 1024): Column =
    Bridge.column(CmsAggExpr(Bridge.expression(key), depth, width)
      .toAggregateExpression())
}

final case class CmsAggExpr(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with ExpectsInputTypes {

  // analysis-time type check: a non-string child must fail during
  // analysis, not as an executor-side ClassCastException
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val k = child.eval(input)
    if (k != null) {
      val key = k.asInstanceOf[UTF8String]
      var d = 0
      while (d < depth) {
        buf(d * width + (Cms.hash48(d, key) % width).toInt) += 1L
        d += 1
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

  override def withNewMutableAggBufferOffset(offset: Int): CmsAggExpr =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CmsAggExpr =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): CmsAggExpr = copy(child = cs.head)
}
