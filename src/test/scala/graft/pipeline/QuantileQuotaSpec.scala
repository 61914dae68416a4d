package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit specs for the stratified exact-quota sampler, the histogram
  * quantile sketch, and the exact-Jaccard ground-truth pair generator.
  */
class QuantileQuotaSpec extends SparkSpec {

  private def docs(rows: (Long, String, String)*): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "stratum", "text")
  }

  test("stratifiedQuota: exactly `total` rows, quotas within 1 of proportional") {
    import spark.implicits._
    // skewed strata: 70 / 25 / 5 rows
    val df = ((1 to 70).map(i => (i.toLong, "big")) ++
      (71 to 95).map(i => (i.toLong, "mid")) ++
      (96 to 100).map(i => (i.toLong, "tiny")))
      .toDF("doc_id", "stratum")
    val total = 17
    val out = Sampling.stratifiedQuota(df, Seq("stratum"), "doc_id", total)
    assert(out.count() == total)
    val quotas = out.groupBy($"stratum").agg(
        max($"quota").as("q"), count(lit(1)).as("n"))
      .collect().map(r => r.getAs[String]("stratum") ->
        (r.getAs[Long]("q"), r.getAs[Long]("n"))).toMap
    // every stratum emits exactly its quota
    quotas.values.foreach { case (q, n) => assert(q == n) }
    // quota is floor or ceil of the exact proportional share
    val shares = Map("big" -> 70, "mid" -> 25, "tiny" -> 5)
    for ((s, (q, _)) <- quotas) {
      val exact = total.toDouble * shares(s) / 100.0
      assert(q == math.floor(exact).toLong || q == math.ceil(exact).toLong,
        s"stratum $s: quota $q not within rounding of $exact")
    }
  }

  test("stratifiedQuota: deterministic across runs and partitionings") {
    import spark.implicits._
    val df = (1 to 200).map(i => (i.toLong, s"s${i % 3}")).toDF("doc_id", "stratum")
    def ids(d: org.apache.spark.sql.DataFrame) =
      Sampling.stratifiedQuota(d, Seq("stratum"), "doc_id", 30)
        .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(ids(df) == ids(df.repartition(13)))
  }

  test("histQuantiles: estimate within one bin width of the exact quantile") {
    import spark.implicits._
    val bins = 16
    val df = ((1 to 100).map(i => ("a", i.toLong)) ++
      (1 to 50).map(i => ("b", (i * 7).toLong)))
      .toDF("g", "v")
    val est = Sketch.histQuantiles(df, "g", "v", bins, Seq(500, 900))
      .collect().map(r => r.getAs[String]("g") ->
        (r.getAs[Long]("p500_est"), r.getAs[Long]("p900_est"))).toMap
    // global grid: lo=1, hi=350 -> span=350, width ~ 22
    val width = math.ceil(350.0 / bins)
    def exactQ(vs: Seq[Long], q: Double): Long =
      vs.sorted.apply(math.ceil(q * vs.size).toInt - 1)
    val a = (1 to 100).map(_.toLong)
    val b = (1 to 50).map(i => (i * 7).toLong)
    assert(math.abs(est("a")._1 - exactQ(a, 0.5)) <= width)
    assert(math.abs(est("a")._2 - exactQ(a, 0.9)) <= width)
    assert(math.abs(est("b")._1 - exactQ(b, 0.5)) <= width)
    assert(math.abs(est("b")._2 - exactQ(b, 0.9)) <= width)
  }

  test("histQuantiles: partitioning-invariant (bin counts are mergeable)") {
    import spark.implicits._
    val df = (1 to 500).map(i => (s"g${i % 4}", (i * 13 % 997).toLong))
      .toDF("g", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sketch.histQuantiles(d, "g", "v", 32, Seq(500, 900))
        .orderBy($"g").collect().toSeq.map(_.toString)
    assert(run(df) == run(df.repartition(17)))
  }

  test("exactJaccardPairs: hand-checked intersection and threshold") {
    import spark.implicits._
    val d = docs(
      (1L, "x", "a b c d"), // shingles {abc, bcd}
      (2L, "x", "a b c e"), // shingles {abc, bce}; J(1,2) = 1/3
      (3L, "x", "p q r s"), // disjoint
      (4L, "x", "a b c d")) // J(1,4) = 1
    val pairs = Dedup.exactJaccardPairs(d, "doc_id", "text",
        nGram = 3, threshold = 0.2)
      .orderBy($"doc_a", $"doc_b")
      .select($"doc_a", $"doc_b", $"jaccard")
      .as[(Long, Long, Double)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2)) == Seq((1L, 2L), (1L, 4L), (2L, 4L)))
    val j = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(math.abs(j((1L, 2L)) - 1.0 / 3.0) < 1e-12)
    assert(j((1L, 4L)) == 1.0)
    // raising the threshold drops the 1/3 pairs
    val strict = Dedup.exactJaccardPairs(d, "doc_id", "text",
      nGram = 3, threshold = 0.5)
    assert(strict.count() == 1)
  }

  test("exactJaccardPairs agrees with minhashPairs' verified jaccard on shared candidates") {
    import spark.implicits._
    val d = docs(
      (1L, "x", "the quick brown fox jumps over the lazy dog"),
      (2L, "x", "the quick brown fox jumps over the lazy cat"),
      (3L, "x", "completely different words here nothing shared at all"))
    val exact = Dedup.exactJaccardPairs(d, "doc_id", "text", 3, 0.01)
      .select($"doc_a", $"doc_b", $"jaccard")
      .as[(Long, Long, Double)].collect()
      .map(p => (p._1, p._2) -> p._3).toMap
    val lsh = Dedup.minhashPairs(d, "doc_id", "text", 3, 6, 3, 0.01)
      .select($"doc_a", $"doc_b", $"jaccard")
      .as[(Long, Long, Double)].collect()
      .map(p => (p._1, p._2) -> p._3).toMap
    // every LSH-found pair's verified jaccard matches the exact one
    assert(lsh.nonEmpty)
    for ((k, v) <- lsh) assert(math.abs(exact(k) - v) < 1e-12)
  }

  test("termDrift: signs and counts match the hand-computed KL contributions") {
    import spark.implicits._
    val d = Seq(
      (1L, true, "x x x y"), // snapshot A: x overrepresented
      (2L, true, "x y z"),
      (3L, false, "y y z z"), // snapshot B
      (4L, false, "x y z")
    ).toDF("doc_id", "in_a", "text")
    val rows = Vocab.termDrift(d, "doc_id", "text", col("in_a"), k = 10)
      .collect().map(r => r.getAs[String]("tok") ->
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Long]("drift_q"))).toMap
    // A: x=4, y=2, z=1 (ta=7); B: x=1, y=3, z=3 (tb=7)
    assert(rows("x") == ((4L, 1L, math.floor(4.0/7 * math.log(4.0/1) * 1e9).toLong)))
    assert(rows("y")._3 < 0 && rows("z")._3 < 0) // underrepresented in A
    // top |contribution| is x (0.79 nat weighted) — first in ranking
    val top = Vocab.termDrift(d, "doc_id", "text", col("in_a"), k = 1)
      .collect().head.getAs[String]("tok")
    assert(top == "x")
  }

  test("bpeTrain matches a hand-rolled reference on the textbook corpus") {
    import spark.implicits._
    // classic BPE example word frequencies
    val freqs = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val text = freqs.toSeq.sortBy(_._1)
      .flatMap { case (w, f) => Seq.fill(f.toInt)(w) }.mkString(" ")
    val d = Seq((1L, text)).toDF("doc_id", "text")

    // reference implementation: greedy most-frequent adjacent pair,
    // ties lexicographic, left-to-right non-overlapping merge
    def refBpe(rounds: Int): Seq[(Int, String, String, Long)] = {
      var words = freqs.toSeq.map { case (w, f) =>
        (w.map(_.toString).toVector, f) }
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
      for (r <- 1 to rounds) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        for ((syms, f) <- words; p <- syms.zip(syms.tail))
          counts(p) = counts.getOrElse(p, 0L) + f
        if (counts.nonEmpty) {
          val ((a, b), n) = counts.toSeq
            .minBy { case ((a, b), n) => (-n, a, b) }
          out += ((r, a, b, n))
          words = words.map { case (syms, f) =>
            val acc = scala.collection.mutable.ArrayBuffer.empty[String]
            for (s <- syms) {
              if (acc.nonEmpty && acc.last == a && s == b)
                acc(acc.length - 1) = a + b
              else acc += s
            }
            (acc.toVector, f)
          }
        }
      }
      out.toSeq
    }

    val got = Vocab.bpeTrain(d, "doc_id", "text", rounds = 6)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got == refBpe(6), s"got=$got want=${refBpe(6)}")
    // sanity on the textbook: round 1 merges the most frequent pair
    assert(got.head._4 == got.map(_._4).max)
  }

  test("cluster representative is the most central member, not the lowest id") {
    import spark.implicits._
    // star around doc 3: J(3,1)=J(3,2)=0.6, J(1,2)=1/3 -> doc 3 has the
    // highest summed similarity even though doc 1 has the lowest id
    val d = Seq(
      (1L, "x y c d e f g h i j"),
      (2L, "a b c d e f g h p q"),
      (3L, "a b c d e f g h i j")
    ).toDF("doc_id", "text")
    val pr = Dedup.minhashPairs(d, "doc_id", "text", 3, 6, 3, 0.2)
      .select($"doc_a", $"doc_b",
        floor($"jaccard" * 1e6).cast("long").as("jq"))
    val labels = Dedup.clusters(d.select($"doc_id"),
      pr.select($"doc_a", $"doc_b"))
    val scores = pr.select($"doc_a".as("doc_id"), $"jq")
      .union(pr.select($"doc_b".as("doc_id"), $"jq"))
      .groupBy($"doc_id").agg(sum($"jq").as("score_q"))
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy($"cluster_id").orderBy($"score_q".desc, $"doc_id")
    val rep = labels.join(scores, "doc_id")
      .withColumn("rk", row_number().over(wr))
      .where($"rk" === 1)
      .select($"doc_id").as[Long].collect()
    assert(rep.toSeq == Seq(3L), s"representative should be the hub, got ${rep.toSeq}")
  }
}
