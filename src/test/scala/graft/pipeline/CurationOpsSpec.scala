package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit specs for the round-6 curation operators: windowed event dedup,
  * cross-source overlap, tf-idf keyword extraction.
  */
class CurationOpsSpec extends SparkSpec {

  test("firstPerWindow keeps earliest (ts,id) per key per bucket") {
    import spark.implicits._
    val ev = Seq(
      // user 1, type a: three events inside one 600s bucket + one after
      (10L, "1970-01-01 00:00:05", 1L, "a"),
      (11L, "1970-01-01 00:00:05", 1L, "a"), // same ts -> id breaks tie
      (12L, "1970-01-01 00:07:00", 1L, "a"), // same bucket (< 600s)
      (13L, "1970-01-01 00:10:01", 1L, "a"), // next bucket
      // user 1, type b: independent key
      (14L, "1970-01-01 00:00:30", 1L, "b"),
      // user 2: independent key
      (15L, "1970-01-01 00:00:40", 2L, "a")
    ).toDF("event_id", "ts_s", "user_id", "event_type")
      .withColumn("ts", to_timestamp($"ts_s"))
    val kept = Dedup.firstPerWindow(ev, Seq("user_id", "event_type"),
        "ts", "event_id", 600)
      .select($"event_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(10L, 13L, 14L, 15L))
  }

  test("sourceOverlap computes exact pairwise shingle Jaccard") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d", "s1"), // shingles: "a b c","b c d"
      (2L, "a b c e", "s2"), // shingles: "a b c","b c e"
      (3L, "x y z w", "s3"), // disjoint from s1/s2
      (4L, "a b c d", "s1") // duplicate doc, same source: no double count
    ).toDF("doc_id", "text", "source")
    val rows = Contamination.sourceOverlap(docs, nGram = 3)
      .orderBy($"src_a", $"src_b").collect()
    // only (s1,s2) overlap: inter=1 ("a b c"), n_a=2, n_b=2, J=1/3
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[String]("src_a") == "s1" && r.getAs[String]("src_b") == "s2")
    assert(r.getAs[Long]("inter") == 1L)
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 2L)
    assert(math.abs(r.getAs[Double]("jaccard") - 1.0 / 3.0) < 1e-12)
  }

  test("sourceOverlap segments the mask past 62 sources") {
    import spark.implicits._
    // 70 sources spanning two mask words (bit 61 of word 0 through
    // bit 7 of word 1 in sorted order); every source shares "a b c"
    // and owns one private shingle, so every pair has inter=1, n=2,
    // J=1/3 — any cross-word masking bug breaks the pair count.
    val docs = (0 until 70).map { i =>
      (i.toLong, f"a b c tok$i%02d", f"s$i%02d")
    }.toDF("doc_id", "text", "source")
    val rows = Contamination.sourceOverlap(docs, nGram = 3).collect()
    assert(rows.length == 70 * 69 / 2)
    assert(rows.forall(r => r.getAs[Long]("inter") == 1L
      && r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 2L
      && math.abs(r.getAs[Double]("jaccard") - 1.0 / 3.0) < 1e-12))
    // a specific cross-word pair (index 10 in word 0, index 65 in word 1)
    assert(rows.exists(r => r.getAs[String]("src_a") == "s10"
      && r.getAs[String]("src_b") == "s65"))
  }

  test("tfidfTopTerms ranks by quantized tf*ln(N/df), token tiebreak") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x x y common"),
      (2L, "y z common"),
      (3L, "common common")
    ).toDF("doc_id", "text")
    val top = Vocab.tfidfTopTerms(docs, "doc_id", "text", k = 2)
    val byDoc = top.collect().groupBy(_.getAs[Long]("doc"))
    // doc 1: x tf=2 df=1 -> 2*ln(3)q; y tf=1 df=2 -> ln(1.5)q; common df=3 -> 0
    val d1 = byDoc(1L).sortBy(_.getAs[Int]("rk"))
      .map(r => (r.getAs[String]("token"), r.getAs[Long]("tfidf_q"))).toSeq
    val lnQ = (x: Double) => math.floor(math.log(x) * 1e6).toLong
    assert(d1 == Seq(("x", 2 * lnQ(3.0)), ("y", lnQ(1.5))))
    // doc 3: only "common" (tfidf 0, ln(3/3)=0) -> still ranked first
    val d3 = byDoc(3L).map(r =>
      (r.getAs[String]("token"), r.getAs[Long]("tfidf_q"))).toSeq
    assert(d3 == Seq(("common", 0L)))
    // every doc emits at most k rows, ranks are 1..n
    assert(byDoc.values.forall(rs =>
      rs.map(_.getAs[Int]("rk")).sorted.toSeq == (1 to rs.length)))
  }
}
