package graft

import org.scalatest.funsuite.AnyFunSuite

/** The custom expressions are reachable from plain SQL once the graft
  * functions are installed (GraftFunctions.install — the live-session
  * twin of spark.sql.extensions=graft.GraftExtensions, which being a
  * static conf cannot apply to an already-running context). */
class GraftExtensionsSpec extends AnyFunSuite {

  test("custom functions callable from spark.sql") {
    val spark = SparkSpec.session
    GraftFunctions.install(spark)
    val r = spark.sql(
      """SELECT
        |  shingles(split('a b c d', ' '), 2) AS sh,
        |  minhash_sig(array('x', 'y'), 2) AS mh,
        |  simhash(split('hello world', ' ')) AS sim,
        |  doc_fingerprint(split('a b c d e f', ' ')) AS fp,
        |  dot_long(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS dot
        |""".stripMargin).collect().head
    assert(r.getSeq[String](0) == Seq("a b", "b c", "c d"))
    assert(r.getSeq[String](1).length == 2)
    assert(r.getLong(4) == 32L)
    // cross-check simhash against the Column API (same impl both paths)
    import spark.implicits._
    val viaCol = Seq("hello world").toDF("t")
      .select(graft.functions.Hashing.simhashCol(
        org.apache.spark.sql.functions.split($"t", " "), 60))
      .collect().head.getLong(0)
    assert(r.getLong(2) == viaCol)
  }

  test("json/text/vector functions callable from spark.sql") {
    val spark = SparkSpec.session
    GraftFunctions.install(spark)
    val r = spark.sql(
      """SELECT
        |  json_get('{"a":1,"b":"x"}', 'b') AS jg,
        |  json_top_keys('{"a":1,"b":2}') AS jk,
        |  json_to_str_map('{"a":1}') AS jm,
        |  str_map_to_json(map('k', 'v')) AS mj,
        |  json_kv_records('[{"key":"a","value":1.5}]') AS kv,
        |  subword_est(split('abcdefghijkl xy', ' ')) AS sw,
        |  quality_score(split('the quick brown fox', ' ')) AS q,
        |  predict_lang(split('the a of and to in is it', ' ')) AS pl,
        |  predict_lang(split('zz yy xx', ' '), 0.5) AS pl2,
        |  quantize_embedding(array(CAST(0.5 AS FLOAT))) AS qe
        |""".stripMargin).collect().head
    assert(r.getString(0) == "x")
    assert(r.getSeq[String](1) == Seq("a", "b"))
    assert(r.getMap[String, String](2) == Map("a" -> "1"))
    assert(r.getString(3) == """{"k":"v"}""")
    assert(r.getSeq[org.apache.spark.sql.Row](4).head.getDouble(1) == 1.5)
    assert(r.getLong(5) == 3L) // ceil(12/6) + 1
    assert(r.getDouble(6) > 0.0 && r.getDouble(6) <= 1.0)
    assert(r.getString(7) == "en")
    assert(r.getString(8) == "und")
    assert(r.getSeq[Long](9) == Seq(500000L))
  }

  test("aggregate functions (topk_pairs, cms_sketch) callable from spark.sql") {
    val spark = SparkSpec.session
    GraftFunctions.install(spark)
    val tk = spark.sql(
      """SELECT q, topk_pairs(c, id, 2) AS tk FROM VALUES
        |  (1, 0.9D, 10L), (1, 0.7D, 11L), (1, 0.8D, 12L),
        |  (2, 0.5D, 20L), (2, 0.5D, 19L)
        |  AS t(q, c, id) GROUP BY q ORDER BY q""".stripMargin).collect()
    val r1 = tk(0).getSeq[org.apache.spark.sql.Row](1)
    assert(r1.map(e => (e.getInt(0), e.getLong(1))) == Seq((1, 10L), (2, 12L)))
    // ties break by id ascending, matching the Column API
    val r2 = tk(1).getSeq[org.apache.spark.sql.Row](1)
    assert(r2.map(_.getLong(1)) == Seq(19L, 20L))
    val cms = spark.sql(
      """SELECT cms_sketch(k, 2, 8) AS s FROM VALUES ('a'), ('a'), ('b')
        |  AS t(k)""".stripMargin).collect().head.getSeq[Long](0)
    assert(cms.length == 16 && cms.sum == 6L) // 3 keys x 2 rows each
  }
}
