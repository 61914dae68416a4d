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
}
