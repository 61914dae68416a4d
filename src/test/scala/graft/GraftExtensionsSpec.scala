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
}
