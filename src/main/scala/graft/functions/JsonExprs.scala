package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd JSON primitives for the schemaless-document plane.
  *
  * Spark's built-in JSON expressions route through Jackson, and several
  * (`from_json`/JsonToStructs, every higher-order lambda) are
  * CodegenFallback — interpreted `Expression.eval` trees whose shared
  * megamorphic call sites poison the JIT profile for the whole JVM
  * (measured round 1: the same query ran 0.2 s or 50 s depending on
  * which query JIT-compiled first). These expressions replace every
  * catalog use with ONE monomorphic static call over the raw string —
  * a single-pass recursive-descent scanner, no Jackson, no per-element
  * allocation — so the surrounding operator stays inside whole-stage
  * codegen and there is no interpreted surface left to poison.
  *
  * Semantics match the built-ins they replace (and the DuckDB oracle):
  *  - [[JsonGetExpr]]   ≅ get_json_object(doc, '$.key') / `doc->>'key'`
  *    (reference README.md:100-157): unescaped content for strings, raw
  *    literal text for numbers/booleans, raw JSON for nested values,
  *    NULL for JSON null / absent key / malformed input.
  *  - [[JsonTopKeysExpr]] ≅ json_object_keys (jsonb_object_keys, G1).
  *  - [[JsonToStrMapExpr]] ≅ from_json(doc, MAP<STRING,STRING>) (G2).
  *  - [[StrMapToJsonExpr]] / [[StructToJsonLiteExpr]] ≅ to_json on a
  *    string map / flat struct (null struct fields omitted, matching
  *    spark.sql.jsonGenerator.ignoreNullFields=true).
  *  - [[JsonToKVRecordsExpr]] ≅ from_json(doc,
  *    ARRAY<STRUCT<key:STRING, value:DOUBLE>>) (G3 json_to_recordset).
  */
object JsonOps {

  /** Minimal single-pass JSON scanner over a String. Position-based;
    * every parse method returns null/false on malformed input rather
    * than throwing (PERMISSIVE-mode semantics). */
  private final class Scanner(val s: String) {
    var i: Int = 0
    def ws(): Unit = {
      while (i < s.length && {
        val c = s.charAt(i)
        c == ' ' || c == '\t' || c == '\n' || c == '\r'
      }) i += 1
    }
    def eat(c: Char): Boolean =
      if (i < s.length && s.charAt(i) == c) { i += 1; true } else false
    def peek: Int = if (i < s.length) s.charAt(i) else -1

    /** JSON string starting at '"' — returns unescaped content. */
    def str(): String = {
      if (!eat('"')) return null
      val sb = new java.lang.StringBuilder
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '"') { i += 1; return sb.toString }
        else if (c == '\\') {
          i += 1
          if (i >= s.length) return null
          s.charAt(i) match {
            case '"'  => sb.append('"')
            case '\\' => sb.append('\\')
            case '/'  => sb.append('/')
            case 'b'  => sb.append('\b')
            case 'f'  => sb.append('\f')
            case 'n'  => sb.append('\n')
            case 'r'  => sb.append('\r')
            case 't'  => sb.append('\t')
            case 'u' =>
              // Exactly 4 hex digits — Integer.parseInt would accept a
              // sign ("\u+12f"), which Jackson rejects.
              if (i + 4 >= s.length) return null
              var cp = 0
              var k = 1
              while (k <= 4) {
                val d = Character.digit(s.charAt(i + k), 16)
                if (d < 0) return null
                cp = (cp << 4) | d
                k += 1
              }
              sb.append(cp.toChar)
              i += 4
            case _ => return null
          }
          i += 1
        } else { sb.append(c); i += 1 }
      }
      null
    }

    /** Skip one JSON value of any type (recursive for containers). */
    def skipValue(): Boolean = {
      ws()
      peek match {
        case '"' => str() != null
        case '{' =>
          i += 1; ws()
          if (eat('}')) return true
          var ok = true; var done = false
          while (ok && !done) {
            ws()
            if (str() == null) ok = false
            else { ws(); if (!eat(':')) ok = false
            else if (!skipValue()) ok = false
            else { ws(); if (eat('}')) done = true else if (!eat(',')) ok = false } }
          }
          ok
        case '[' =>
          i += 1; ws()
          if (eat(']')) return true
          var ok = true; var done = false
          while (ok && !done) {
            if (!skipValue()) ok = false
            else { ws(); if (eat(']')) done = true else if (!eat(',')) ok = false }
          }
          ok
        case -1 => false
        case _ =>
          val start = i
          while (i < s.length && {
            val c = s.charAt(i)
            c != ',' && c != '}' && c != ']' && !Character.isWhitespace(c)
          }) i += 1
          i > start && validScalar(start, i)
      }
    }

    /** The bare token in [from,until) must be a JSON literal or number —
      * the built-ins (Jackson) return NULL for {"k":truex}, so do we. */
    private def validScalar(from: Int, until: Int): Boolean = {
      val len = until - from
      def is(lit: String): Boolean =
        len == lit.length && s.regionMatches(from, lit, 0, len)
      if (is("true") || is("false") || is("null")) return true
      // number: -?(0|[1-9][0-9]*)(\.[0-9]+)?([eE][+-]?[0-9]+)?
      var j = from
      def digit: Boolean = j < until && s.charAt(j) >= '0' && s.charAt(j) <= '9'
      if (j < until && s.charAt(j) == '-') j += 1
      if (!digit) return false
      if (s.charAt(j) == '0') j += 1
      else while (digit) j += 1
      if (j < until && s.charAt(j) == '.') {
        j += 1
        if (!digit) return false
        while (digit) j += 1
      }
      if (j < until && (s.charAt(j) == 'e' || s.charAt(j) == 'E')) {
        j += 1
        if (j < until && (s.charAt(j) == '+' || s.charAt(j) == '-')) j += 1
        if (!digit) return false
        while (digit) j += 1
      }
      j == until
    }

    /** Value at the cursor as its ->> string form: unescaped content for
      * strings, raw text for scalars/containers, null for JSON null or
      * malformed. Sets `bad` on malformed input.
      *
      * Container values are returned as the raw source substring,
      * interior whitespace preserved — NOT re-minified the way
      * from_json(doc, MAP<STRING,STRING>) re-serializes nested values.
      * This matches Postgres ->> (which returns jsonb's stored text for
      * containers); callers feeding pretty-printed nested JSON should
      * not expect compact output. */
    var bad: Boolean = false

    /** Value at the cursor as its `->` RAW JSON slice: quotes and
      * escapes PRESERVED for strings (`"100"`, not `100` — the
      * README.md:106-111 distinction), source text for numbers /
      * booleans / containers, null for JSON null (matching
      * jsonb->-cast-to-text and DuckDB json_extract, both of which
      * surface JSON null as SQL NULL). */
    def valueAsRaw(): String = {
      ws()
      val start = i
      if (!skipValue()) { bad = true; null }
      else {
        val raw = s.substring(start, i)
        if (raw == "null") null else raw
      }
    }

    def valueAsString(): String = {
      ws()
      if (peek == '"') {
        val v = str()
        if (v == null) { bad = true; null } else v
      } else {
        val start = i
        if (!skipValue()) { bad = true; null }
        else {
          val raw = s.substring(start, i)
          if (raw == "null") null else raw
        }
      }
    }
  }

  /** ->> : top-level key extraction. Duplicate keys resolve last-wins,
    * matching Postgres jsonb (which dedupes keys keeping the last at
    * parse time) — the whole object is scanned either way, so a late
    * duplicate costs nothing extra. Malformed documents (even after a
    * match) return NULL, like the Jackson-backed built-ins. */
  def getField(json: UTF8String, key: String): UTF8String = {
    val sc = new Scanner(json.toString)
    sc.ws()
    if (!sc.eat('{')) return null
    sc.ws()
    if (sc.eat('}')) return null
    var found: String = null
    var foundNull = false
    while (true) {
      sc.ws()
      val name = sc.str()
      if (name == null) return null
      sc.ws()
      if (!sc.eat(':')) return null
      if (name == key) {
        val v = sc.valueAsString()
        if (sc.bad) return null
        found = v
        foundNull = v == null
      } else if (!sc.skipValue()) return null
      sc.ws()
      if (sc.eat('}')) {
        return if (found == null || foundNull) null
        else UTF8String.fromString(found)
      }
      if (!sc.eat(',')) return null
    }
    null
  }

  /** `->` : top-level key extraction, JSON-TYPED — the value's raw JSON
    * slice with string quotes kept (P1: `doc->'myvar'` is `"100"`,
    * `doc->>'myvar'` is `100`, reference README.md:102,106-111).
    * Same walk and last-wins duplicate handling as [[getField]]. */
  def getFieldJson(json: UTF8String, key: String): UTF8String = {
    val sc = new Scanner(json.toString)
    sc.ws()
    if (!sc.eat('{')) return null
    sc.ws()
    if (sc.eat('}')) return null
    var found: String = null
    while (true) {
      sc.ws()
      val name = sc.str()
      if (name == null) return null
      sc.ws()
      if (!sc.eat(':')) return null
      if (name == key) {
        val v = sc.valueAsRaw()
        if (sc.bad) return null
        found = v
      } else if (!sc.skipValue()) return null
      sc.ws()
      if (sc.eat('}'))
        return if (found == null) null else UTF8String.fromString(found)
      if (!sc.eat(',')) return null
    }
    null
  }

  /** Top-level key list, document order. */
  def topKeys(json: UTF8String): ArrayData = {
    val sc = new Scanner(json.toString)
    sc.ws()
    if (!sc.eat('{')) return null
    sc.ws()
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    if (sc.eat('}')) return new GenericArrayData(out.toArray)
    while (true) {
      sc.ws()
      val name = sc.str()
      if (name == null) return null
      sc.ws()
      if (!sc.eat(':')) return null
      if (!sc.skipValue()) return null
      out += UTF8String.fromString(name)
      sc.ws()
      if (sc.eat('}')) return new GenericArrayData(out.toArray)
      if (!sc.eat(',')) return null
    }
    null
  }

  /** Top-level object as MAP<STRING,STRING> (values in ->> form). */
  def toStrMap(json: UTF8String): MapData = {
    val sc = new Scanner(json.toString)
    sc.ws()
    if (!sc.eat('{')) return null
    sc.ws()
    val ks = scala.collection.mutable.ArrayBuffer.empty[Any]
    val vs = scala.collection.mutable.ArrayBuffer.empty[Any]
    def result = new ArrayBasedMapData(
      new GenericArrayData(ks.toArray), new GenericArrayData(vs.toArray))
    if (sc.eat('}')) return result
    while (true) {
      sc.ws()
      val name = sc.str()
      if (name == null) return null
      sc.ws()
      if (!sc.eat(':')) return null
      val v = sc.valueAsString()
      if (sc.bad) return null
      ks += UTF8String.fromString(name)
      vs += (if (v == null) null else UTF8String.fromString(v))
      sc.ws()
      if (sc.eat('}')) return result
      if (!sc.eat(',')) return null
    }
    null
  }

  private def writeEscaped(sb: java.lang.StringBuilder, s: UTF8String): Unit = {
    sb.append('"')
    val str = s.toString
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      c match {
        case '"'  => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.append('"')
  }

  /** MAP<STRING,STRING> -> JSON object text (insertion order). */
  def strMapToJson(m: MapData): UTF8String = {
    val keys = m.keyArray()
    val vals = m.valueArray()
    val sb = new java.lang.StringBuilder
    sb.append('{')
    var i = 0
    while (i < m.numElements()) {
      if (i > 0) sb.append(',')
      writeEscaped(sb, keys.getUTF8String(i))
      sb.append(':')
      if (vals.isNullAt(i)) sb.append("null")
      else writeEscaped(sb, vals.getUTF8String(i))
      i += 1
    }
    sb.append('}')
    UTF8String.fromString(sb.toString)
  }

  /** Flat struct -> JSON object text; null fields omitted (matches
    * to_json with spark.sql.jsonGenerator.ignoreNullFields=true). */
  def structToJson(row: InternalRow, schema: StructType): UTF8String = {
    val sb = new java.lang.StringBuilder
    sb.append('{')
    var first = true
    var i = 0
    while (i < schema.length) {
      if (!row.isNullAt(i)) {
        if (!first) sb.append(',')
        first = false
        writeEscaped(sb, UTF8String.fromString(schema(i).name))
        sb.append(':')
        schema(i).dataType match {
          case StringType  => writeEscaped(sb, row.getUTF8String(i))
          case IntegerType => sb.append(row.getInt(i))
          case LongType    => sb.append(row.getLong(i))
          case BooleanType => sb.append(row.getBoolean(i))
          case DoubleType  => sb.append(row.getDouble(i))
          case FloatType   => sb.append(row.getFloat(i))
          case other => throw new IllegalArgumentException(
            s"structToJson: unsupported field type $other")
        }
      }
      i += 1
    }
    sb.append('}')
    UTF8String.fromString(sb.toString)
  }

  /** JSON array of flat objects -> ARRAY<STRUCT<key:STRING,value:DOUBLE>>
    * (the G3 json_to_recordset shape). Unknown fields are skipped;
    * malformed input yields NULL. */
  def kvRecords(json: UTF8String): ArrayData = {
    val sc = new Scanner(json.toString)
    sc.ws()
    if (!sc.eat('[')) return null
    sc.ws()
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    if (sc.eat(']')) return new GenericArrayData(out.toArray)
    while (true) {
      sc.ws()
      if (!sc.eat('{')) return null
      var key: UTF8String = null
      var value: java.lang.Double = null
      sc.ws()
      if (!sc.eat('}')) {
        var done = false
        while (!done) {
          sc.ws()
          val name = sc.str()
          if (name == null) return null
          sc.ws()
          if (!sc.eat(':')) return null
          if (name == "key") {
            val v = sc.valueAsString()
            if (sc.bad) return null
            key = if (v == null) null else UTF8String.fromString(v)
          } else if (name == "value") {
            val v = sc.valueAsString()
            if (sc.bad) return null
            if (v != null) {
              try value = java.lang.Double.valueOf(v)
              catch { case _: NumberFormatException => return null }
            }
          } else if (!sc.skipValue()) return null
          sc.ws()
          if (sc.eat('}')) done = true
          else if (!sc.eat(',')) return null
        }
      }
      out += new GenericInternalRow(Array[Any](key, value))
      sc.ws()
      if (sc.eat(']')) return new GenericArrayData(out.toArray)
      if (!sc.eat(',')) return null
    }
    null
  }
}

/** Column-level API for the codegen'd JSON expressions. */
object Json {
  def get(doc: Column, key: String): Column =
    Bridge.column(JsonGetExpr(Bridge.expression(doc), key))
  def getJson(doc: Column, key: String): Column =
    Bridge.column(JsonGetJsonExpr(Bridge.expression(doc), key))
  def topKeys(doc: Column): Column =
    Bridge.column(JsonTopKeysExpr(Bridge.expression(doc)))
  def toStrMap(doc: Column): Column =
    Bridge.column(JsonToStrMapExpr(Bridge.expression(doc)))
  def mapToJson(m: Column): Column =
    Bridge.column(StrMapToJsonExpr(Bridge.expression(m)))
  def structToJson(st: Column): Column =
    Bridge.column(StructToJsonLiteExpr(Bridge.expression(st)))
  def kvRecords(doc: Column): Column =
    Bridge.column(JsonToKVRecordsExpr(Bridge.expression(doc)))
}

/** Shared codegen shape: one static call that may return null. */
trait JsonStaticCall { self: UnaryExpression =>
  protected def callCode(c: String, ctx: CodegenContext): String

  protected def nullableStaticCall(ctx: CodegenContext, ev: ExprCode): ExprCode =
    self.nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = ${callCode(c, ctx)};
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
}

/** ->> top-level key extraction (P1/P2, README.md:100-157). */
final case class JsonGetExpr(child: Expression, key: String)
    extends UnaryExpression with JsonStaticCall with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    JsonOps.getField(input.asInstanceOf[UTF8String], key)
  override protected def callCode(c: String, ctx: CodegenContext): String = {
    val keyRef = ctx.addReferenceObj("key", key, "java.lang.String")
    s"graft.functions.JsonOps.getField($c, $keyRef)"
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullableStaticCall(ctx, ev)
  override protected def withNewChildInternal(c: Expression): JsonGetExpr =
    copy(child = c)
}

/** -> top-level key extraction, JSON-typed (P1: quotes preserved). */
final case class JsonGetJsonExpr(child: Expression, key: String)
    extends UnaryExpression with JsonStaticCall with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    JsonOps.getFieldJson(input.asInstanceOf[UTF8String], key)
  override protected def callCode(c: String, ctx: CodegenContext): String = {
    val keyRef = ctx.addReferenceObj("key", key, "java.lang.String")
    s"graft.functions.JsonOps.getFieldJson($c, $keyRef)"
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullableStaticCall(ctx, ev)
  override protected def withNewChildInternal(c: Expression): JsonGetJsonExpr =
    copy(child = c)
}

/** jsonb_object_keys (G1). */
final case class JsonTopKeysExpr(child: Expression)
    extends UnaryExpression with JsonStaticCall with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    JsonOps.topKeys(input.asInstanceOf[UTF8String])
  override protected def callCode(c: String, ctx: CodegenContext): String =
    s"graft.functions.JsonOps.topKeys($c)"
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullableStaticCall(ctx, ev)
  override protected def withNewChildInternal(c: Expression): JsonTopKeysExpr =
    copy(child = c)
}

/** json_each source map (G2). */
final case class JsonToStrMapExpr(child: Expression)
    extends UnaryExpression with JsonStaticCall with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType =
    MapType(StringType, StringType, valueContainsNull = true)
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    JsonOps.toStrMap(input.asInstanceOf[UTF8String])
  override protected def callCode(c: String, ctx: CodegenContext): String =
    s"graft.functions.JsonOps.toStrMap($c)"
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullableStaticCall(ctx, ev)
  override protected def withNewChildInternal(c: Expression): JsonToStrMapExpr =
    copy(child = c)
}

/** to_json over MAP<STRING,STRING>. */
final case class StrMapToJsonExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(MapType(StringType, StringType))
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    JsonOps.strMapToJson(input.asInstanceOf[MapData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.JsonOps.strMapToJson($c)")
  override protected def withNewChildInternal(c: Expression): StrMapToJsonExpr =
    copy(child = c)
}

/** to_json over a flat struct of primitives (null fields omitted). */
final case class StructToJsonLiteExpr(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case st: StructType =>
      val bad = st.filterNot(f => f.dataType match {
        case StringType | IntegerType | LongType | BooleanType |
             DoubleType | FloatType => true
        case _ => false
      })
      if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"struct_to_json supports flat primitive structs; unsupported: " +
          bad.map(f => s"${f.name}: ${f.dataType.simpleString}").mkString(", "))
    case other => TypeCheckResult.TypeCheckFailure(
      s"struct_to_json expects STRUCT, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  private lazy val schema = child.dataType.asInstanceOf[StructType]
  override def nullSafeEval(input: Any): Any =
    JsonOps.structToJson(input.asInstanceOf[InternalRow], schema)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val schemaRef = ctx.addReferenceObj("schema", schema,
      classOf[StructType].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.JsonOps.structToJson($c, $schemaRef)")
  }
  override protected def withNewChildInternal(c: Expression): StructToJsonLiteExpr =
    copy(child = c)
}

/** json_to_recordset (G3): ARRAY<STRUCT<key:STRING,value:DOUBLE>>. */
final case class JsonToKVRecordsExpr(child: Expression)
    extends UnaryExpression with JsonStaticCall with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("key", StringType),
      StructField("value", DoubleType))),
    containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    JsonOps.kvRecords(input.asInstanceOf[UTF8String])
  override protected def callCode(c: String, ctx: CodegenContext): String =
    s"graft.functions.JsonOps.kvRecords($c)"
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullableStaticCall(ctx, ev)
  override protected def withNewChildInternal(c: Expression): JsonToKVRecordsExpr =
    copy(child = c)
}
