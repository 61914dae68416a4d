package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd hashing expressions for the dedup/fingerprint hot path.
  *
  * The same algorithms are expressible with built-in higher-order
  * functions (`transform` + `md5` + `array_min` — see TextOps), but HOF
  * lambdas are interpreted (CodegenFallback), allocate per element, and
  * fetch a fresh MessageDigest per call — at 100 TB the signature pass
  * dominates the whole dedup pipeline, and even at test scale the
  * interpreted path shows 30x jitter depending on JIT luck. Each
  * expression here is ONE monomorphic static method over the array,
  * with a thread-local digest and byte-wise (not string) min tracking;
  * `doGenCode` emits a single call, so the surrounding operator stays
  * inside whole-stage codegen.
  *
  * Outputs are BIT-IDENTICAL to the HOF formulations (and to the DuckDB
  * oracles): md5 lowercase hex, lexicographic-min = unsigned-byte-min.
  */
object Hashing {

  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  private val HEX = "0123456789abcdef".toCharArray

  private def hex(bytes: Array[Byte]): UTF8String = {
    val out = new Array[Byte](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(2 * i) = HEX((bytes(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = HEX(bytes(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Unsigned lexicographic byte compare (= compare of lowercase-hex
    * strings of the same digests). */
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  /** Word n-gram shingles (ordered, with duplicates), single pass.
    * Matches TextOps.shingles: < n words -> empty array. */
  def shingles(words: ArrayData, n: Int): ArrayData = {
    val sz = words.numElements()
    if (sz < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](sz - n + 1)
    var i = 0
    while (i <= sz - n) {
      val sb = new java.lang.StringBuilder
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        val w = words.getUTF8String(i + k)
        sb.append(if (w == null) "" else w.toString)
        k += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** k-permutation MinHash signature: element p = min over shingles of
    * md5("mh<p>:" ++ shingle), lowercase hex. One digest reuse, one pass
    * per permutation, hex-encode only the k winners. */
  def minhashSig(shingleSet: ArrayData, k: Int): ArrayData = {
    val digest = md.get()
    val n = shingleSet.numElements()
    val mins = new Array[Array[Byte]](k)
    var p = 0
    while (p < k) {
      val salt = s"mh$p:".getBytes("UTF-8")
      var best: Array[Byte] = null
      var i = 0
      while (i < n) {
        val s = shingleSet.getUTF8String(i)
        if (s != null) {
          digest.reset()
          digest.update(salt)
          digest.update(s.getBytes)
          val d = digest.digest()
          if (best == null || less(d, best)) best = d
        }
        i += 1
      }
      mins(p) = best
      p += 1
    }
    new GenericArrayData(
      mins.map(b => if (b == null) null else hex(b)): Array[Any])
  }

  /** 60-bit md5-derived word hash: first 15 hex chars of md5(word) as a
    * base-16 long = top 60 bits of the first 8 digest bytes. Matches
    * TextOps.wordHash / DuckDB CAST('0x'||substr(md5(w),1,15) AS BIGINT). */
  def wordHash60(digest: MessageDigest, w: UTF8String): Long = {
    digest.reset()
    val d = digest.digest(w.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** 60-bit SimHash: per-bit majority vote over word hashes, one pass.
    * Matches TextOps.simhash bit-for-bit. */
  def simhash(words: ArrayData, bits: Int): Long = {
    val digest = md.get()
    val votes = new Array[Int](bits)
    val n = words.numElements()
    var i = 0
    while (i < n) {
      val w = words.getUTF8String(i)
      if (w != null) {
        val h = wordHash60(digest, w)
        var b = 0
        while (b < bits) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** Winnowing-style fingerprint: min md5 over word n-gram shingles;
    * < n words -> md5 of the space-joined words. Matches
    * TextOps.fingerprint bit-for-bit. */
  def fingerprint(words: ArrayData, n: Int): UTF8String = {
    val digest = md.get()
    val sz = words.numElements()
    def wordAt(i: Int): String = {
      val w = words.getUTF8String(i)
      if (w == null) "" else w.toString
    }
    if (sz < n) {
      val joined = (0 until sz).map(wordAt).mkString(" ")
      digest.reset()
      return hex(digest.digest(joined.getBytes("UTF-8")))
    }
    var best: Array[Byte] = null
    var i = 0
    while (i <= sz - n) {
      val sb = new java.lang.StringBuilder
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(wordAt(i + k))
        k += 1
      }
      digest.reset()
      val d = digest.digest(sb.toString.getBytes("UTF-8"))
      if (best == null || less(d, best)) best = d
      i += 1
    }
    hex(best)
  }

  // ---- Column wrappers ----
  def shinglesCol(words: Column, n: Int): Column =
    Bridge.column(ShinglesExpr(Bridge.expression(words), n))
  def minhashSigCol(shingleSet: Column, k: Int): Column =
    Bridge.column(MinHashSigExpr(Bridge.expression(shingleSet), k))
  def simhashCol(words: Column, bits: Int): Column =
    Bridge.column(SimHashExpr(Bridge.expression(words), bits))
  def fingerprintCol(words: Column, n: Int): Column =
    Bridge.column(FingerprintExpr(Bridge.expression(words), n))
}

/** Base for unary array-input hash expressions: null-safe, codegen via a
  * single static call into [[Hashing]]. */
trait HashingStaticCall { self: UnaryExpression =>
  /** Scala object method reference, e.g. "shingles". */
  def methodName: String
  def extraArg: Int

  protected def staticCall(ctx: CodegenContext, ev: ExprCode): ExprCode =
    self.defineCodeGen(ctx, ev, c =>
      s"graft.functions.Hashing.$methodName($c, $extraArg)")
}

final case class ShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression with HashingStaticCall {
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def methodName: String = "shingles"
  override def extraArg: Int = n
  override def nullSafeEval(input: Any): Any =
    Hashing.shingles(input.asInstanceOf[ArrayData], n)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    staticCall(ctx, ev)
  override protected def withNewChildInternal(c: Expression): ShinglesExpr =
    copy(child = c)
}

final case class MinHashSigExpr(child: Expression, k: Int)
    extends UnaryExpression with HashingStaticCall {
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def methodName: String = "minhashSig"
  override def extraArg: Int = k
  override def nullSafeEval(input: Any): Any =
    Hashing.minhashSig(input.asInstanceOf[ArrayData], k)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    staticCall(ctx, ev)
  override protected def withNewChildInternal(c: Expression): MinHashSigExpr =
    copy(child = c)
}

final case class SimHashExpr(child: Expression, bits: Int)
    extends UnaryExpression with HashingStaticCall {
  override def dataType: DataType = LongType
  override def methodName: String = "simhash"
  override def extraArg: Int = bits
  override def nullSafeEval(input: Any): Any =
    Hashing.simhash(input.asInstanceOf[ArrayData], bits)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    staticCall(ctx, ev)
  override protected def withNewChildInternal(c: Expression): SimHashExpr =
    copy(child = c)
}

final case class FingerprintExpr(child: Expression, n: Int)
    extends UnaryExpression with HashingStaticCall {
  override def dataType: DataType = StringType
  override def methodName: String = "fingerprint"
  override def extraArg: Int = n
  override def nullSafeEval(input: Any): Any =
    Hashing.fingerprint(input.asInstanceOf[ArrayData], n)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    staticCall(ctx, ev)
  override protected def withNewChildInternal(c: Expression): FingerprintExpr =
    copy(child = c)
}
