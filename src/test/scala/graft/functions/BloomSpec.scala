package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.pipeline.Contamination

/** Bloom filter invariants: zero false negatives (the property the
  * decontamination prefilter's correctness rests on), merge = union,
  * a sane false-positive rate at the sized capacity, and the
  * prefiltered contamination path returning exactly the exact-join
  * result.
  */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i =>
      g.apply(Gen.Parameters.default.withSize(20), Seed(8800L + i)))

  private def buildDirect(keys: Seq[String], numBits: Int, k: Int): Array[Long] = {
    val agg = BloomAggExpr(
      org.apache.spark.sql.catalyst.expressions.Literal("x"), numBits, k)
    val buf = agg.createAggregationBuffer()
    keys.foreach(s => Bloom.setBits(buf, UTF8String.fromString(s)))
    buf
  }

  private def contains(buf: Array[Long], key: String): Boolean =
    Bloom.mightContain(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        buf.map(l => l: Any)),
      UTF8String.fromString(key))

  test("no false negatives, ever (property)") {
    val keyGen = Gen.listOfN(40, Gen.alphaNumStr.suchThat(_.nonEmpty))
    for (keys <- samples(keyGen, 30)) {
      val buf = buildDirect(keys, numBits = 1 << 12, k = 6)
      keys.foreach(key =>
        assert(contains(buf, key), s"false negative for $key"))
    }
  }

  test("merge equals union") {
    val a = (0 until 500).map(i => s"a$i")
    val b = (0 until 500).map(i => s"b$i")
    val merged = buildDirect(a, 1 << 14, 6)
    val bufB = buildDirect(b, 1 << 14, 6)
    val agg = BloomAggExpr(
      org.apache.spark.sql.catalyst.expressions.Literal("x"), 1 << 14, 6)
    agg.merge(merged, bufB)
    val whole = buildDirect(a ++ b, 1 << 14, 6)
    assert(merged.toSeq == whole.toSeq)
    (a ++ b).foreach(key => assert(contains(merged, key)))
  }

  test("false-positive rate is bounded at the sized capacity") {
    // 1000 keys in 2^14 bits with k=6 -> theoretical fp ~ 0.2%; assert
    // an order-of-magnitude cushion, not the exact constant
    val keys = (0 until 1000).map(i => s"member$i")
    val buf = buildDirect(keys, 1 << 14, 6)
    val probes = (0 until 10000).map(i => s"absent$i")
    val fp = probes.count(p => contains(buf, p))
    assert(fp < 200, s"false-positive rate too high: $fp/10000")
  }

  test("SQL surface: bloom_build + bloom_contains round-trip") {
    graft.GraftFunctions.install(spark)
    spark.createDataset(Seq("x1", "x2", "x3")).toDF("s")
      .createOrReplaceTempView("bloom_in")
    val hits = spark.sql(
      """SELECT probe FROM (SELECT bloom_build(s, 4096, 4) AS bf FROM bloom_in)
        |CROSS JOIN (SELECT explode(array('x1','x2','x3','y1','y2')) AS probe)
        |WHERE bloom_contains(bf, probe)""".stripMargin)
      .as[String].collect().toSet
    assert(Set("x1", "x2", "x3").subsetOf(hits))
    assert(!hits.contains("y1") || !hits.contains("y2") || hits.size <= 5)
  }

  test("prefiltered contamination equals the exact join") {
    val docs = (0L until 120L).map { i =>
      val words = (0 until 12).map(j => s"w${(i * 7 + j * 3) % 40}")
      (i, words.mkString(" "))
    }.toDF("doc_id", "text")
    val train = docs.where(col("doc_id") < 100)
    val test0 = docs.where(col("doc_id") >= 100)
    val exact = Contamination.shingleHits(train, test0)
      .orderBy("doc_id").collect().toSeq
    val bloomed = Contamination.bloomShingleHits(train, test0,
        numBits = 1 << 12, numHashes = 4)
      .orderBy("doc_id").collect().toSeq
    assert(exact.nonEmpty)
    assert(bloomed == exact)
  }
}
