package graft.pipeline

import graft.SparkSpec

class ClusterSpec extends SparkSpec {

  test("clusters: min-label components, chains, singletons") {
    import spark.implicits._
    val ids = (1L to 8L).toDF("doc_id")
    // component {1,2,3} via chain, {5,6}, singletons 4,7,8
    val pairs = Seq((2L, 1L), (2L, 3L), (5L, 6L)).toDF("doc_a", "doc_b")
    val got = Dedup.clusters(ids, pairs).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 7L, 8L -> 8L))
  }

  test("clusters: long chain converges to the global min (diameter rounds)") {
    import spark.implicits._
    val ids = (10L to 16L).toDF("doc_id")
    val pairs = (10L to 15L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = Dedup.clusters(ids, pairs).orderBy("doc_id")
      .collect().map(_.getLong(1)).toSeq
    assert(got == Seq.fill(7)(10L))
  }

  test("clustersStar: same components as clusters on the basic graph") {
    import spark.implicits._
    val ids = (1L to 8L).toDF("doc_id")
    val pairs = Seq((2L, 1L), (2L, 3L), (5L, 6L)).toDF("doc_a", "doc_b")
    val got = Dedup.clustersStar(ids, pairs).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 7L, 8L -> 8L))
  }

  test("clustersStar: 1000-node chain converges within ~log2(n) rounds") {
    import spark.implicits._
    // the adversarial case for plain propagation: diameter 999. The
    // alternating-star contraction must close it in O(log n) rounds —
    // assert a 2*log2(n)+slack bound (log2(1000) ≈ 10), far below the
    // ~500 a one-hop walk with path halving would spend.
    val n = 1000L
    val pairs = (1L until n).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val (stars, rounds) = Dedup.starContract(pairs, maxIter = 50)
    assert(rounds <= 22, s"chain took $rounds rounds")
    // fixpoint is one star rooted at the global min
    val roots = stars.select("lo").distinct().collect().map(_.getLong(0)).toSeq
    assert(roots == Seq(1L))
    val members = stars.select("hi").distinct().count()
    assert(members == n - 1)
  }

  test("property: clustersStar ≡ clusters on random graphs") {
    import spark.implicits._
    val rng = new scala.util.Random(19)
    for (trial <- 1 to 4) {
      val n = 30 + rng.nextInt(120)
      val nEdges = rng.nextInt(2 * n)
      val ids = (1L to n.toLong).toDF("doc_id")
      val pairs = Seq.fill(nEdges)(
        (1L + rng.nextInt(n), 1L + rng.nextInt(n)))
        .toDF("doc_a", "doc_b")
      val a = Dedup.clusters(ids, pairs).orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val b = Dedup.clustersStar(ids, pairs).orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(a == b, s"trial $trial (n=$n, e=$nEdges) diverged")
    }
  }

  test("clustersStar: no edges -> every doc is its own cluster") {
    import spark.implicits._
    val ids = (1L to 5L).toDF("doc_id")
    val pairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val got = Dedup.clustersStar(ids, pairs).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == (1L to 5L).map(i => i -> i))
  }
}
