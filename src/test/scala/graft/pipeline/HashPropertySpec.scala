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

  test("property: RepetitionStatsExpr == plain-Scala model on arbitrary texts") {
    val texts = samples(textGen, 15)
    val rows = texts.toDF("text")
      .select(col("text"),
        graft.functions.Text.repetitionStats(TextOps.tokens(col("text")))
          .as("fast")).collect()
    rows.foreach { r =>
      val toks = r.getString(0).split(" ", -1).toSeq
      val n = toks.length
      val maxTok = toks.groupBy(identity).values.map(_.size).max
      val bgs = toks.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
      val maxBg = if (bgs.isEmpty) 0 else bgs.groupBy(identity).values.map(_.size).max
      val want = Seq(
        maxTok.toLong * 1000L / n,
        if (n < 2) 0L else maxBg.toLong * 1000L / (n - 1),
        1000L - toks.distinct.size.toLong * 1000L / n)
      assert(r.getSeq[Long](1) == want, s"text=${r.getString(0)}")
    }
  }

  test("property: QuantStatsExpr == plain-Scala model on arbitrary vectors") {
    val comp: Gen[Float] = Gen.oneOf(
      Gen.chooseNum(-2.0f, 2.0f),
      Gen.oneOf(0.0f, -0.0f, 1e-9f, -1e-9f, 1.0f, -1.0f))
    val vecs = samples(Gen.listOfN(12, comp), 15) ++ Seq(List.fill(8)(0.0f))
    val rows = vecs.map(v => Tuple1(v.toArray)).toDF("e")
      .select(col("e"),
        graft.functions.Vectors.quantStatsCol(col("e")).as("fast")).collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](0)
      var ma = v.map(x => math.abs(x.toDouble)).max
      if (ma < 1e-12) ma = 1e-12
      var err = 0L; var sat = 0L
      v.foreach { f =>
        val x = f.toDouble
        val q = math.floor(x * 127.0 / ma + 0.5)
        if (q == 127.0 || q == -127.0) sat += 1
        err += math.floor(math.abs(x - q * ma / 127.0) * 1e9).toLong
      }
      val want = Seq(v.size.toLong, math.floor(ma * 1e6).toLong, err, sat)
      assert(r.getSeq[Long](1) == want, s"vec=$v")
    }
  }
}
