package graft.pipeline

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.functions.JsonOps
import org.apache.spark.unsafe.types.UTF8String

/** Unit + property coverage for the hand-rolled JSON scanner
  * (graft.functions.JsonOps) against the Jackson-backed semantics it
  * claims: malformed documents -> NULL, \u escapes need exactly 4 hex
  * digits, bare scalars must be valid JSON literals/numbers, duplicate
  * keys resolve last-wins (Postgres jsonb). */
class JsonOpsSpec extends SparkSpec {

  private def get(doc: String, key: String): String = {
    val r = JsonOps.getField(UTF8String.fromString(doc), key)
    if (r == null) null else r.toString
  }

  test("valid scalars, strings, containers extract in ->> form") {
    assert(get("""{"k":1}""", "k") == "1")
    assert(get("""{"k":-1.5e3}""", "k") == "-1.5e3")
    assert(get("""{"k":true}""", "k") == "true")
    assert(get("""{"k":"a\nb"}""", "k") == "a\nb")
    assert(get("""{"k":{"x":1}}""", "k") == """{"x":1}""")
    assert(get("""{"k":[1,2]}""", "k") == "[1,2]")
    assert(get("""{"k":null}""", "k") == null)
    assert(get("""{"k":1}""", "missing") == null)
  }

  test("malformed scalar tokens are rejected, as Jackson rejects them") {
    assert(get("""{"k":truex}""", "k") == null)     // not a literal
    assert(get("""{"k":1.2.3}""", "k") == null)     // not a number
    assert(get("""{"k":01}""", "k") == null)        // leading zero
    assert(get("""{"k":+1}""", "k") == null)        // leading plus
    assert(get("""{"k":1.}""", "k") == null)        // dangling point
    assert(get("""{"k":1e}""", "k") == null)        // dangling exponent
    assert(get("""{"k":nul}""", "k") == null)
  }

  test("\\u escapes need exactly 4 hex digits (no signs)") {
    // (Scala pre-processes \u even in triple quotes, hence the splice)
    val u = "\\" + "u"
    assert(get(s"""{"k":"${u}0041"}""", "k") == "A")
    assert(get(s"""{"k":"$u+12f"}""", "k") == null) // Integer.parseInt trap
    assert(get(s"""{"k":"${u}12"}""", "k") == null)
    assert(get(s"""{"k":"${u}ZZZZ"}""", "k") == null)
  }

  test("duplicate keys resolve last-wins (jsonb), malformed tail kills the match") {
    assert(get("""{"k":1,"k":2}""", "k") == "2")
    assert(get("""{"k":"a","x":0,"k":"b"}""", "k") == "b")
    // a malformed document returns NULL even when the key matched first
    assert(get("""{"k":1,"bad":tru}""", "k") == null)
  }

  test("property: getField agrees with Spark's get_json_object on clean docs") {
    import spark.implicits._
    val kv: Gen[List[(String, String)]] = for {
      n <- Gen.choose(1, 5)
      keys <- Gen.listOfN(n, Gen.alphaStr.map(_.take(6)).suchThat(_.nonEmpty))
      vals <- Gen.listOfN(n, Gen.oneOf(
        Gen.choose(-1000, 1000).map(_.toString),
        Gen.alphaNumStr.map(s => "\"" + s.take(10) + "\""),
        Gen.oneOf("true", "false", "null")))
    } yield keys.distinct.zip(vals)
    val cases = (1 to 25).flatMap(i =>
      kv.apply(Gen.Parameters.default.withSize(6 + i), Seed(7L + i)))
      .filter(_.nonEmpty)
    assert(cases.nonEmpty)
    cases.foreach { pairs =>
      val doc = pairs.map { case (k, v) => s""""$k":$v""" }
        .mkString("{", ",", "}")
      val row = Seq(doc).toDF("doc").selectExpr(
        pairs.map { case (k, _) => s"get_json_object(doc, '$$.$k')" }: _*)
        .collect().head
      pairs.zipWithIndex.foreach { case ((k, _), i) =>
        val expected = if (row.isNullAt(i)) null else row.getString(i)
        assert(get(doc, k) == expected,
          s"doc=$doc key=$k got=${get(doc, k)} expected=$expected")
      }
    }
  }

  private def getJson(doc: String, key: String): String = {
    val r = JsonOps.getFieldJson(UTF8String.fromString(doc), key)
    if (r == null) null else r.toString
  }

  test("-> returns the RAW JSON slice: quotes kept, escapes unprocessed") {
    // the reference's documented P1 distinction (README.md:106-111):
    // doc->'myvar' is "100" WITH quotes; doc->>'myvar' is 100
    assert(getJson("""{"myvar":"100"}""", "myvar") == "\"100\"")
    assert(get("""{"myvar":"100"}""", "myvar") == "100")
    assert(getJson("""{"k":"a\nb"}""", "k") == "\"a\\nb\"") // escape kept
    assert(getJson("""{"k":1}""", "k") == "1")              // number: same
    assert(getJson("""{"k":-1.5e3}""", "k") == "-1.5e3")
    assert(getJson("""{"k":true}""", "k") == "true")
    assert(getJson("""{"k":{"x":1}}""", "k") == """{"x":1}""")
    assert(getJson("""{"k":[1,"a"]}""", "k") == """[1,"a"]""")
  }

  test("-> null semantics and error paths match ->> / json_extract") {
    assert(getJson("""{"k":null}""", "k") == null)   // JSON null -> SQL NULL
    assert(getJson("""{"k":1}""", "missing") == null)
    assert(getJson("""{"k":trux}""", "k") == null)   // malformed -> NULL
    assert(getJson("""not json""", "k") == null)
    assert(getJson("""{"k":1,"k":"2"}""", "k") == "\"2\"") // last-wins
    assert(getJson("""{"k":"2","k":null}""", "k") == null) // last-wins null
  }
}
