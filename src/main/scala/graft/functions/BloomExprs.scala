package graft.functions

import java.nio.ByteBuffer
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bloom filter as a custom mergeable Catalyst aggregate plus a
  * codegen'd membership probe — the big-side PRE-SHUFFLE semi-join
  * reducer for decontamination and any small-set⋈corpus join.
  *
  * The 100 TB decontamination problem: the training corpus's shingle
  * stream must meet the held-out set's shingle hashes, but shuffling
  * every training shingle to the join costs shuffle ∝ corpus, and
  * broadcasting the held-out hash SET costs 32+ bytes per distinct
  * shingle. The Bloom filter broadcasts `numBits/8` bytes TOTAL
  * (1 MiB covers ~1M shingles at 1% false positives), the corpus
  * filters against it inside the scan's whole-stage-codegen pass, and
  * only true hits + the false-positive residue reach the exchange —
  * the exact verify join downstream removes the residue, so the
  * result is bit-identical to the plain equi-join. No false negatives
  * by construction (same guarantee Spark's own runtime bloom-filter
  * join pruning relies on).
  *
  * Mechanics: k bit positions per key via Kirsch-Mitzenmacher double
  * hashing (pos_i = h1 + i*h2 mod m) off ONE md5 per key — same
  * thread-local-digest discipline as [[Cms]]. The aggregate buffer is
  * a raw long array; partial aggregation works the standard way
  * (update map-side, merge = bitwise OR reduce-side), which also makes
  * two corpora's filters unionable — the same streaming-friendly
  * mergeability as the CMS/HLL sketches. The evaluated value is
  * self-describing: word 0 carries k, words 1.. carry the bits, so
  * the probe side needs no out-of-band parameters.
  */
object Bloom {

  private val localMd = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  private def be64(h: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (h(off + i) & 0xffL); i += 1 }
    v
  }

  /** Set the key's k bit positions in `buf` (word 0 is the k header,
    * bits live in words 1..). One md5 per key; h2 forced odd so the
    * double-hash stride cycles the whole table. */
  def setBits(buf: Array[Long], key: UTF8String): Unit = {
    val md = localMd.get()
    md.reset()
    val h = md.digest(key.getBytes)
    val m = (buf.length - 1).toLong * 64L
    val h1 = be64(h, 0)
    val h2 = be64(h, 8) | 1L
    val k = buf(0).toInt
    var i = 0
    while (i < k) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, m)
      buf(1 + (pos >>> 6).toInt) |= 1L << (pos & 63L)
      i += 1
    }
  }

  /** Probe an evaluated filter (ARRAY<LONG>, word 0 = k). Called from
    * generated code — must stay allocation-free beyond the digest. */
  def mightContain(bits: ArrayData, key: UTF8String): Boolean = {
    val md = localMd.get()
    md.reset()
    val h = md.digest(key.getBytes)
    val m = (bits.numElements() - 1).toLong * 64L
    val h1 = be64(h, 0)
    val h2 = be64(h, 8) | 1L
    val k = bits.getLong(0).toInt
    var i = 0
    while (i < k) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, m)
      if ((bits.getLong(1 + (pos >>> 6).toInt) & (1L << (pos & 63L))) == 0L)
        return false
      i += 1
    }
    true
  }

  /** Aggregate a string key column into a Bloom filter (ARRAY<LONG>,
    * word 0 = numHashes, words 1.. = the bit table). */
  def build(key: Column, numBits: Int = 1 << 20, numHashes: Int = 6): Column =
    Bridge.column(BloomAggExpr(Bridge.expression(key), numBits, numHashes)
      .toAggregateExpression())

  /** Membership probe of a built filter; false ⇒ definitely absent. */
  def contains(bloom: Column, key: Column): Column =
    Bridge.column(BloomContainsExpr(
      Bridge.expression(bloom), Bridge.expression(key)))
}

final case class BloomAggExpr(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with ExpectsInputTypes {

  require(numBits >= 64 && numHashes >= 1,
    s"bloom_build: need numBits >= 64 and numHashes >= 1, got ($numBits, $numHashes)")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = {
    val buf = new Array[Long](1 + (numBits + 63) / 64)
    buf(0) = numHashes.toLong
    buf
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val k = child.eval(input)
    if (k != null) Bloom.setBits(buf, k.asInstanceOf[UTF8String])
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 1
    while (i < a.length) { a(i) |= b(i); i += 1 }
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

  override def withNewMutableAggBufferOffset(offset: Int): BloomAggExpr =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BloomAggExpr =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): BloomAggExpr = copy(child = cs.head)
}

/** `bloom_contains(filter, key)` — codegen'd static call, so the probe
  * runs inside the scan's whole-stage-codegen pass (the point: filter
  * BEFORE the exchange). */
final case class BloomContainsExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType, containsNull = false), StringType)
  override def dataType: DataType = BooleanType

  override def nullSafeEval(bloom: Any, key: Any): Any =
    Bloom.mightContain(
      bloom.asInstanceOf[ArrayData], key.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, k) =>
      s"graft.functions.Bloom.mightContain($b, $k)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): BloomContainsExpr = copy(left = l, right = r)
}
