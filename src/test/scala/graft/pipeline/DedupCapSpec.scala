package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Frequency-capped LSH: candidate work stays linear under boilerplate
  * skew, and the capped pair set is component-equivalent to the
  * uncapped one when no bucket trips. */
class DedupCapSpec extends SparkSpec {
  import spark.implicits._

  private val base = Seq(
    1L -> "the quick brown fox jumps over the lazy dog tonight again",
    2L -> "colorless green ideas sleep furiously in the deep cold winter",
    3L -> "a completely different sentence about spark shuffle metrics today",
    4L -> "the quick brown fox jumps over the lazy dog tonight again") // dup of 1

  /** base docs + `g` exact copies of doc 1's text (one hot bucket per band). */
  private def skewed(g: Int): DataFrame =
    (base ++ (1 to g).map(i => (1000L + i) -> base.head._2))
      .toDF("doc_id", "text")

  private def components(ids: DataFrame, pairs: DataFrame): Set[Set[Long]] =
    Dedup.clusters(ids, pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._2)
      .map(_._2.map(_._1).toSet).toSet

  test("capped pairs are component-equivalent to uncapped (cap not tripped)") {
    val d = skewed(20)
    val ids = d.select($"doc_id")
    val capped = Dedup.minhashPairsCapped(d, "doc_id", "text",
      nGram = 3, k = 6, bands = 3, threshold = 0.2, bucketCap = 64)
    val uncapped = Dedup.minhashPairs(d, "doc_id", "text",
      nGram = 3, k = 6, bands = 3, threshold = 0.2)
    assert(components(ids, capped.select($"doc_a", $"doc_b")) ==
      components(ids, uncapped.select($"doc_a", $"doc_b")))
  }

  test("candidate work is linear in the exact-dup group, not quadratic") {
    // 200 exact copies: uncapped candidates >= C(201,2) = 20100 pairs;
    // capped = star pairs (one per member) + delegate-level joins only.
    val g = 200
    val capped = Dedup.minhashPairsCapped(skewed(g), "doc_id", "text",
      nGram = 3, k = 6, bands = 3, threshold = 0.2, bucketCap = 64)
    val n = capped.count()
    // star: g copies + doc 4 all collapse onto delegate 1 -> g+1 pairs;
    // delegate-level verified pairs can add at most a handful among the
    // 3 distinct contents. Anything near g²/2 means the cap failed.
    assert(n >= g + 1 && n <= g + 10, s"pair count $n not linear in group size")
    // survivor predicate: every copy (and doc 4) flagged, delegate kept
    val flagged = capped.select($"doc_b").distinct().as[Long].collect().toSet
    assert(flagged.contains(4L) && (1 to g).forall(i => flagged.contains(1000L + i)))
    assert(!flagged.contains(1L))
  }

  test("hot buckets are diverted and reported, not self-joined") {
    // 40 NEAR-copies (distinct tail token) -> ~40 distinct contents
    // sharing band keys; cap=8 must divert those buckets and report them
    val near = (base ++ (1 to 40).map(i =>
      (1000L + i) -> (base.head._2 + " zz" + i))).toDF("doc_id", "text")
    val hot = Dedup.minhashHotBuckets(near, "doc_id", "text",
      nGram = 3, k = 6, bands = 3, bucketCap = 8)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(hot.nonEmpty, "expected diverted buckets on a near-copy storm")
    assert(hot.forall(_._3 > 8))
    // the capped join must not produce the storm's quadratic pair set
    val capped = Dedup.minhashPairsCapped(near, "doc_id", "text",
      nGram = 3, k = 6, bands = 3, threshold = 0.2, bucketCap = 8)
    assert(capped.count() < 200, "diverted bucket leaked into the join")
  }

  test("simhash capped: identical-signature collapse + component equivalence") {
    val d = skewed(30)
    val ids = d.select($"doc_id")
    val capped = Dedup.simhashPairsCapped(d, "doc_id", "text",
      maxHamming = 8, chunks = 4, bucketCap = 64)
    val uncapped = Dedup.simhashPairs(d, "doc_id", "text",
      maxHamming = 8, chunks = 4)
    assert(components(ids, capped.select($"doc_a", $"doc_b")) ==
      components(ids, uncapped.select($"doc_a", $"doc_b")))
    // linear: 30 copies + doc 4 star onto delegate 1
    assert(capped.count() <= 40)
  }
}
