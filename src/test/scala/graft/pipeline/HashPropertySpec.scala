package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.functions.Hashing

/** Property tests: the codegen'd hash expressions are bit-identical to
  * their interpreted HOF formulations on arbitrary token sequences —
  * including unicode, empty strings, and duplicate-heavy inputs.
  * (Manual generator driving; see ChangePropertySpec for why.)
  */
class HashPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int = 10): Seq[A] =
    (1 to n).flatMap(i =>
      g.apply(Gen.Parameters.default.withSize(6 + i * 3), Seed(100L + i)))

  private val word: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(12)),
    Gen.oneOf("the", "a", "naïve", "日本語", "x", "", "mh0:"))

  private val textGen: Gen[String] =
    Gen.listOf(word).map(_.mkString(" "))

  private def hofShingles(words: org.apache.spark.sql.Column, n: Int) =
    when(size(words) >= n,
      transform(sequence(lit(0), size(words) - n), i =>
        concat_ws(" ", (0 until n).map(k => element_at(words, i + k + 1)): _*)))
      .otherwise(array())

  test("property: ShinglesExpr == HOF on arbitrary texts") {
    val texts = samples(textGen, 15)
    val words = TextOps.tokens(col("text"))
    val rows = texts.toDF("text")
      .select(Hashing.shinglesCol(words, 3).as("fast"),
        hofShingles(words, 3).as("ref")).collect()
    rows.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
  }

  test("property: MinHashSigExpr == HOF on arbitrary shingle sets") {
    val texts = samples(textGen, 15)
    val words = TextOps.tokens(col("text"))
    val ss = array_distinct(hofShingles(words, 2))
    val hof = array((0 until 4).map(p =>
      array_min(transform(ss, s => md5(concat(lit(s"mh$p:"), s))))): _*)
    val rows = texts.toDF("text")
      .select(Hashing.minhashSigCol(ss, 4).as("fast"), hof.as("ref")).collect()
    rows.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
  }

  test("property: SimHashExpr == HOF on arbitrary token lists") {
    val texts = samples(textGen, 15)
    val words = TextOps.tokens(col("text"))
    val hof = TextOps.simhashFromHashes(
      transform(words, TextOps.wordHash(_)), 60)
    val rows = texts.toDF("text")
      .select(Hashing.simhashCol(words, 60).as("fast"), hof.as("ref")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("property: FingerprintExpr == HOF on arbitrary token lists") {
    val texts = samples(textGen, 15)
    val words = TextOps.tokens(col("text"))
    val hof = when(size(words) >= 5,
      array_min(transform(sequence(lit(0), size(words) - 5), i =>
        md5(concat_ws(" ", (0 until 5).map(k => element_at(words, i + k + 1)): _*)))))
      .otherwise(md5(concat_ws(" ", words)))
    val rows = texts.toDF("text")
      .select(Hashing.fingerprintCol(words, 5).as("fast"), hof.as("ref")).collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("property: DotLongExpr == HOF zip_with aggregate") {
    val vecGen = Gen.listOfN(16, Gen.chooseNum(-1000000L, 1000000L))
    val pairs = samples(Gen.zip(vecGen, vecGen), 15)
    val rows = pairs.toDF("a", "b")
      .select(
        graft.functions.Vectors.dotCol(col("a"), col("b")).as("fast"),
        aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
          lit(0L), (acc, v) => acc + v).as("ref")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }
}
