package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Specs for the corpus-curation operators added in round 3:
  * balanced stratified sampling, unigram-LM scoring, kNN labeling. */
class CurationSpec extends SparkSpec {

  test("balancedSample: under-cap groups untouched, over-cap groups thinned") {
    import spark.implicits._
    // group "big": 400 rows; group "small": 5 rows; cap 100
    val df = ((1L to 400L).map(i => (i, "big")) ++
      (401L to 405L).map(i => (i, "small"))).toDF("id", "g")
    val kept = Sampling.balancedSample(df, "g", "id", 100)
    val byG = kept.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // small group: keep-rate permille = 1000 -> all 5 survive
    assert(byG("small") == 5)
    // big group: keep-rate 250/1000 -> ~100 in expectation, md5-uniform
    assert(byG("big") > 60 && byG("big") < 140)
  }

  test("balancedSample: deterministic and nested (smaller cap ⊂ larger cap)") {
    import spark.implicits._
    val df = (1L to 300L).map(i => (i, "g")).toDF("id", "g")
    val k50 = Sampling.balancedSample(df, "g", "id", 50)
      .select("id").collect().map(_.getLong(0)).toSet
    val k150 = Sampling.balancedSample(df, "g", "id", 150)
      .select("id").collect().map(_.getLong(0)).toSet
    val k50again = Sampling.balancedSample(df, "g", "id", 50)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(k50 == k50again)
    assert(k50.subsetOf(k150))
  }

  test("unigramLogProb: frequent-token docs score higher than rare-token docs") {
    import spark.implicits._
    // "the" dominates the corpus; doc 3 is all rare tokens
    val docs = Seq(
      (1L, "the the the the"),
      (2L, "the the cat sat"),
      (3L, "zyx qwv jkl pqr")).toDF("doc_id", "text")
    val got = Vocab.unigramLogProb(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    val score = got.map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(score(1L) > score(2L) && score(2L) > score(3L))
    // n_tokens and the quantized sum are exact
    assert(got.forall(_.getLong(1) == 4L))
    val lpSum = got.map(_.getLong(2))
    assert(lpSum.forall(_ < 0L)) // log-probs are negative
  }

  test("unigramLogProb: score is partitioning-invariant (integer quantization)") {
    import spark.implicits._
    val docs = (1L to 50L)
      .map(i => (i, s"tok${i % 7} tok${i % 3} the a of tok${i % 11}"))
      .toDF("doc_id", "text")
    val a = Vocab.unigramLogProb(docs.repartition(1), "doc_id", "text")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(2)))
    val b = Vocab.unigramLogProb(docs.repartition(13), "doc_id", "text")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(a.sameElements(b))
  }

  test("sortedNeighborPairs: near-dups found via sort adjacency, strangers not") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, base),                          // near-dup of 2
      (2L, base + " extra"),               // one-word edit
      (3L, (100 to 140).map(i => s"zz$i").mkString(" "))) // unrelated
      .toDF("doc_id", "text")
    val got = Dedup.sortedNeighborPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 2L)))
    assert(!got.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("sortedNeighborPairs: distributed index == exact global lead order") {
    import spark.implicits._
    // enough docs that signatures spread across many sig-high-bit
    // buckets, including pairs straddling bucket edges
    val docs = (1L to 120L)
      .map(i => (i, (0 to 12).map(t => s"w${(i * 7 + t * 3) % 23}").mkString(" ")))
      .toDF("doc_id", "text").repartition(7)
    val window = 3
    val got = Dedup.sortedNeighborPairs(docs, "doc_id", "text",
      window = window, maxHamming = 60)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // brute-force reference: true global (sig, doc_id) order, next-w leads
    val sigs = docs.select($"doc_id",
      TextOps.simhash(TextOps.tokens($"text"), bits = 60).as("sig"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(p => (p._2, p._1))
    val want = (for {
      i <- sigs.indices; k <- 1 to window; if i + k < sigs.length
      (ida, sa) = sigs(i); (idb, sb) = sigs(i + k)
    } yield (math.min(ida, idb), math.max(ida, idb),
      java.lang.Long.bitCount(sa ^ sb))).toSet
    assert(got == want)
    // and the index really spans multiple buckets (the test is vacuous
    // if everything landed in one)
    val nBuckets = sigs.map(_._2 >> 55).distinct.length
    assert(nBuckets > 1, s"expected multi-bucket spread, got $nBuckets")
  }

  test("normalize: case, punctuation, and whitespace noise collapse away") {
    import spark.implicits._
    val got = Seq(
      "  Hello,   WORLD!! 42 ",
      "a b c",
      "!!!").toDF("text")
      .select(TextOps.normalize($"text")).collect().map(_.getString(0))
    assert(got.toSeq == Seq("hello world 42", "a b c", ""))
  }

  test("chunk windows: size/stride math covers every token exactly") {
    import spark.implicits._
    // 100 tokens, size 40, stride 30 -> starts 0/30/60; the final
    // window ends at token 99 (nothing dropped, nothing phantom)
    val rows = graft.SparkEntry.queries("p46_chunk_windows")(
      spark, "/root/testdata/sf0.001")
    // exercise the closed form directly on a crafted doc too
    val n = 100; val size = 40; val stride = 30
    val nc = if (n <= size) 1 else 1 + (n - (size - stride + 1)) / stride
    assert(nc == 3)
    val covered = (0 until nc).flatMap(i => i * stride until
      math.min(i * stride + size, n)).toSet
    assert(covered == (0 until n).toSet)
    assert(rows.columns.toSeq ==
      Seq("doc_id", "chunk_idx", "chunk_tokens", "chunk_hash"))
  }

  test("bigramSurprisal: likely transitions score lower than shuffled ones") {
    import spark.implicits._
    // "a b" dominates; doc 3 uses the same unigrams in unseen order
    val docs = Seq(
      (1L, "a b a b a b a b"),
      (2L, "a b a b a b b a"),
      (3L, "b b b a a a b b")).toDF("doc_id", "text")
    val got = Vocab.bigramSurprisal(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(1L) < got(2L) && got(2L) < got(3L))
  }

  test("vocabGrowth: running vocab counts each token at first appearance") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x y"), (2L, "y z"), (3L, "x y z"), (4L, "w")).toDF("doc_id", "text")
    val got = Vocab.vocabGrowth(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 2L, 2L), (2L, 1L, 3L), (3L, 0L, 3L), (4L, 1L, 4L)))
  }

  test("pmiPairs: tokens that always co-occur outrank independent ones") {
    import spark.implicits._
    // p+q co-occur in every doc they appear in; r appears everywhere
    val docs = (1L to 20L).map { i =>
      val t = if (i <= 10) "p q r" else "r s t"
      (i, t)
    }.toDF("doc_id", "text")
    val got = Vocab.pmiPairs(docs, "doc_id", "text", minPairCount = 5)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(3))).toMap
    val pq = got(("p", "q")); val pr = got(("p", "r"))
    assert(pq > pr) // P(q|p)=1 with rare q beats pairing with ubiquitous r
  }

  test("knnClassify: majority label wins; tie breaks to smaller label") {
    import spark.implicits._
    // 1-D embeddings padded to 2 dims; query at 0.95: neighbors at
    // 1.0(l=1), 0.9(l=1), 0.8(l=2) -> k=3 majority 1
    def emb(x: Double) = Array(x.toFloat, 1.0f)
    val labeled = Seq(
      (10L, emb(1.0), 1), (11L, emb(0.9), 1), (12L, emb(0.8), 2),
      (13L, emb(-1.0), 2), (14L, emb(-0.9), 2))
      .toDF("vec_id", "embedding", "label")
    val queries = Seq((1L, emb(0.95), 0), (2L, emb(-0.95), 0))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.knnClassify(queries, labeled, 3)
      .orderBy("query_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 1, 2L), (2L, 2, 3L)))
  }

  test("hardNegatives: nearest different-label vectors, own label excluded") {
    import spark.implicits._
    def emb(x: Double) = Array(x.toFloat, 1.0f)
    val pool = Seq(
      (10L, emb(1.0), 1), (11L, emb(0.95), 1), // same label as query 1
      (12L, emb(0.9), 2), (13L, emb(0.5), 2), (14L, emb(-1.0), 3))
      .toDF("vec_id", "embedding", "label")
    val queries = Seq((1L, emb(1.0), 1)).toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(queries, pool, k = 2)
      .orderBy("rank").collect().map(r => (r.getInt(1), r.getLong(2)))
    // 10/11 share the query's label -> excluded even though nearest;
    // hardest negatives are the closest label-2 vectors, in cos order
    assert(got.toSeq == Seq((1, 12L), (2, 13L)))
  }

  test("dsirWeights: docs resembling the target distribution score higher") {
    import spark.implicits._
    // target docs speak "alpha beta"; pool doc 10 echoes them, doc 11
    // is from a disjoint vocabulary -> 10 must outweigh 11
    val docs = Seq(
      (1L, "alpha beta alpha beta", true),
      (2L, "alpha beta beta gamma", true),
      (10L, "alpha beta alpha gamma", false),
      (11L, "zebra quark vortex nim", false))
      .toDF("doc_id", "text", "is_t")
    val got = Vocab.dsirWeights(docs, "doc_id", "text", col("is_t"),
        nBuckets = 64, topN = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3))).toSeq
    val w = got.map(g => g._1 -> g._2).toMap
    assert(w(10L) > w(11L))
    // topN=3: the three highest weights are selected, doc 11 is not
    val sel = got.filter(_._3).map(_._1).toSet
    assert(sel.size == 3 && !sel.contains(11L))
  }

  test("dsirWeights: weights are partitioning-invariant and selection nested") {
    import spark.implicits._
    val docs = (1L to 60L)
      .map(i => (i, s"tok${i % 9} tok${i % 4} the of tok${i % 13}", i % 5 == 0))
      .toDF("doc_id", "text", "is_t")
    def run(df: org.apache.spark.sql.DataFrame, n: Int) =
      Vocab.dsirWeights(df, "doc_id", "text", col("is_t"), topN = n)
    val a = run(docs.repartition(1), 10).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val b = run(docs.repartition(13), 10).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(a.toSeq == b.toSeq) // integer micro-nat sums: order-free
    val s10 = run(docs, 10).where(col("selected"))
      .collect().map(_.getLong(0)).toSet
    val s25 = run(docs, 25).where(col("selected"))
      .collect().map(_.getLong(0)).toSet
    assert(s10.size == 10 && s25.size == 25 && s10.subsetOf(s25))
  }

  test("dsirResample: seeded Gumbel draw is deterministic and seed-sensitive") {
    import spark.implicits._
    val docs = (1L to 80L)
      .map(i => (i, s"tok${i % 11} tok${i % 5} the of tok${i % 7}", i % 4 == 0))
      .toDF("doc_id", "text", "is_t")
    def sel(df: org.apache.spark.sql.DataFrame, seed: String) =
      Vocab.dsirResample(df, "doc_id", "text", col("is_t"),
          topN = 20, seed = seed)
        .where(col("selected")).collect().map(_.getLong(0)).toSet
    val a = sel(docs.repartition(1), "g1")
    val b = sel(docs.repartition(13), "g1")
    assert(a == b && a.size == 20) // hash-seeded: partitioning-invariant
    val c = sel(docs, "g2")
    assert(c.size == 20 && c != a, "a different seed must change the draw")
    // the noisy draw stays weight-aware: overlap with the argmax pick
    // is substantial but not total (that's the point of resampling)
    val argmax = Vocab.dsirWeights(docs, "doc_id", "text", col("is_t"),
        topN = 20)
      .where(col("selected")).collect().map(_.getLong(0)).toSet
    assert((a intersect argmax).nonEmpty)
  }

  test("bm25TopK: term coverage and rarity drive the ranking") {
    import spark.implicits._
    // doc 1 covers both query terms; doc 2 one; doc 3 none; doc 4 is
    // doc 1 diluted by padding -> length normalization demotes it
    val docs = Seq(
      (1L, "spark merge spark merge"),
      (2L, "spark table table table"),
      (3L, "row scan filter group"),
      (4L, "spark merge pad pad pad pad pad pad pad pad pad pad pad pad"))
      .toDF("doc_id", "text")
    val got = Vocab.bm25TopK(docs, "doc_id", "text",
        Seq(1L -> "spark merge"), k = 10)
      .orderBy("rank").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._2).toSeq == Seq(1L, 4L, 2L))  // 3 never matches
    assert(got.head._3 > got(1)._3 && got(1)._3 > got(2)._3)
  }

  test("rrfFuse: consensus across retrievers outranks a single top hit") {
    import spark.implicits._
    // retriever A: doc 10 first, doc 20 second; retriever B: doc 20
    // first, doc 30 second. Doc 20 appears in both -> fused winner.
    val a = Seq((1L, 1, 10L), (1L, 2, 20L)).toDF("query_id", "rank", "doc_id")
    val b = Seq((1L, 1, 20L), (1L, 2, 30L)).toDF("query_id", "rank", "doc_id")
    val got = Retrieval.rrfFuse(Seq(a, b), k = 3)
      .orderBy("rank").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._2).toSeq == Seq(20L, 10L, 30L), s"got ${got.toSeq}")
    // exact integer points: 1e9/61 + 1e9/62 for the consensus doc
    assert(got.head._3 == 1000000000L / 61 + 1000000000L / 62)
    // the singles keep their own list's reciprocal points
    assert(got(1)._3 == 1000000000L / 61 && got(2)._3 == 1000000000L / 62)
  }

  test("bm25PassageTopK: a relevant passage buried in a long doc still wins") {
    import spark.implicits._
    // doc 1: 200 filler tokens + one dense relevant window; doc 2: a
    // short doc with one weak mention. Whole-doc BM25 punishes doc 1's
    // length; chunk-grain scoring must surface its buried passage.
    val buried = (("pad " * 200).trim.split(" ") ++
      Array("spark", "spark", "spark")).mkString(" ")
    val docs = Seq((1L, buried), (2L, "spark pad pad pad pad pad"))
      .toDF("doc_id", "text")
    val qs = Seq(1L -> "spark")
    val passage = Retrieval.bm25PassageTopK(docs, "doc_id", "text", qs,
        k = 2, window = 10, stride = 5)
      .orderBy("rank").collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(passage.head == (1, 1L),
      s"buried passage must rank first: ${passage.toSeq}")
    val wholeDoc = Vocab.bm25TopK(docs, "doc_id", "text", qs, k = 2)
      .orderBy("rank").collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(wholeDoc.head == (1, 2L),
      s"whole-doc ranking should bury doc 1 (the contrast): ${wholeDoc.toSeq}")
  }

  test("bm25TopK: scores are partitioning-invariant; ties break by doc id") {
    import spark.implicits._
    val docs = (1L to 40L)
      .map(i => (i, s"w${i % 7} w${i % 3} filler w${i % 7}"))
      .toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      Vocab.bm25TopK(df, "doc_id", "text",
        Seq(1L -> "w1 w2", 2L -> "w0"), k = 6)
        .orderBy("query_id", "rank")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val a = run(docs.repartition(1))
    val b = run(docs.repartition(11))
    assert(a.toSeq == b.toSeq) // exact-integer scoring: order-free
    // identical docs (same residues) tie on score -> ranked by doc id
    val q2 = a.filter(_._1 == 2L)
    q2.groupBy(_._4).values.foreach { grp =>
      assert(grp.map(_._3).toSeq == grp.map(_._3).sorted.toSeq)
    }
  }
}
