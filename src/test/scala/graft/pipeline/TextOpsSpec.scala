package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** TextOps / Hashing unit specs.
  *
  * The codegen'd expressions (graft.functions.Hashing) must be
  * bit-identical to the interpreted HOF formulations they replaced —
  * each test computes both and compares exactly.
  */
class TextOpsSpec extends SparkSpec {

  import graft.functions.Hashing

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "one two"), // shorter than shingle width
      (4L, "one two three"), // exactly shingle width
      (5L, ""), // empty text -> [""] token
      (6L, "a a a a a a") // all-duplicate tokens
    ).toDF("doc_id", "text")
  }

  /** The original interpreted HOF shingle formulation. */
  private def hofShingles(words: org.apache.spark.sql.Column, n: Int) =
    when(size(words) >= n,
      transform(sequence(lit(0), size(words) - n), i =>
        concat_ws(" ", (0 until n).map(k => element_at(words, i + k + 1)): _*)))
      .otherwise(array())

  test("ShinglesExpr == HOF shingles") {
    val words = TextOps.tokens(col("text"))
    val rows = docs.select(
      Hashing.shinglesCol(words, 3).as("fast"),
      hofShingles(words, 3).as("ref")).collect()
    rows.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
  }

  test("MinHashSigExpr == HOF minhash per permutation") {
    val words = TextOps.tokens(col("text"))
    val ss = array_distinct(hofShingles(words, 3))
    val hof = array((0 until 6).map(p =>
      array_min(transform(ss, s => md5(concat(lit(s"mh$p:"), s))))): _*)
    val rows = docs.select(
      Hashing.minhashSigCol(ss, 6).as("fast"), hof.as("ref")).collect()
    rows.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
  }

  test("SimHashExpr == HOF per-bit majority vote") {
    val words = TextOps.tokens(col("text"))
    val hof = TextOps.simhashFromHashes(
      transform(words, TextOps.wordHash(_)), 60)
    val rows = docs.select(
      Hashing.simhashCol(words, 60).as("fast"), hof.as("ref")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("FingerprintExpr == HOF min-md5 over 5-gram shingles") {
    val words = TextOps.tokens(col("text"))
    val hof = when(size(words) >= 5,
      array_min(transform(sequence(lit(0), size(words) - 5), i =>
        md5(concat_ws(" ", (0 until 5).map(k => element_at(words, i + k + 1)): _*)))))
      .otherwise(md5(concat_ws(" ", words)))
    val rows = docs.select(
      Hashing.fingerprintCol(words, 5).as("fast"), hof.as("ref")).collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("wordHash60 == conv(substr(md5, 1, 15), 16, 10)") {
    val words = TextOps.tokens(col("text"))
    val rows = docs.select(
      transform(words, TextOps.wordHash(_)).as("ref"),
      transform(words, w =>
        graft.functions.Hashing.simhashCol(array(w), 60)).as("single")).collect()
    // a single-word simhash IS its word hash (majority of one vote)
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }

  test("jaccard: identical sets -> 1.0, disjoint -> 0.0") {
    import spark.implicits._
    val df = Seq(
      (Seq("a", "b"), Seq("a", "b"), 1.0),
      (Seq("a", "b"), Seq("c", "d"), 0.0),
      (Seq("a", "b", "c"), Seq("b", "c", "d"), 0.5)
    ).toDF("x", "y", "expect")
    val rows = df.select(TextOps.jaccard($"x", $"y").as("j"), $"expect").collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("bandKeys: same signature band -> same key, different -> different") {
    import spark.implicits._
    val df = Seq(
      (Seq("h1", "h2", "h3", "h4", "h5", "h6"),
        Seq("h1", "h2", "x3", "x4", "x5", "x6"))).toDF("a", "b")
    val r = df.select(
      TextOps.bandKeys($"a", 3, 2).as("ka"),
      TextOps.bandKeys($"b", 3, 2).as("kb")).collect().head
    val (ka, kb) = (r.getSeq[String](0), r.getSeq[String](1))
    assert(ka.head == kb.head) // band 0 = (h1,h2) identical
    assert(ka(1) != kb(1) && ka(2) != kb(2))
  }
}

class DedupSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"), // near-dup of 1
      (3L, "totally different content with no overlap at all"),
      (4L, "alpha beta gamma delta epsilon zeta eta theta"), // exact dup of 1
      (5L, "short text")
    ).toDF("doc_id", "text")
  }

  test("exact dedup groups identical texts, keeps min id") {
    val g = Dedup.exactGroups(corpus, "doc_id", "text")
      .orderBy("keep_id").collect()
    assert(g.length == 4)
    val dup = g.find(_.getLong(2) == 2L).get
    assert(dup.getLong(1) == 1L) // keep_id = min(1, 4)
  }

  test("minhash LSH finds exact and near duplicates, not unrelated docs") {
    val pairs = Dedup.minhashPairs(corpus, "doc_id", "text",
      nGram = 3, k = 6, bands = 3, threshold = 0.2)
      .orderBy("doc_a", "doc_b").collect()
    val found = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found.contains((1L, 4L))) // exact dup: jaccard 1.0
    assert(found.contains((1L, 2L)) || found.contains((2L, 4L))) // near dup
    assert(!found.exists(p => p._1 == 3L || p._2 == 3L))
    val exact = pairs.find(r => (r.getLong(0), r.getLong(1)) == ((1L, 4L))).get
    assert(exact.getDouble(2) == 1.0)
  }

  test("incremental LSH: new batch matches corpus, never itself; lowest-id survivor") {
    // batch = docs {4, 5}: 4 is an exact dup of corpus doc 1, 5 is novel
    val batch = corpus.filter(col("doc_id") >= 4L)
    val standing = corpus.filter(col("doc_id") < 4L)
    val out = Dedup.minhashNewVsCorpus(batch, standing, "doc_id", "text",
      nGram = 3, k = 6, bands = 3, threshold = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.exists(t => t._1 == 4L && t._2 == 1L && t._3 == 1.0),
      s"exact dup 4->1 not flagged: ${out.mkString(",")}")
    assert(!out.exists(_._1 == 5L), "novel doc wrongly flagged")
    assert(out.forall(t => t._2 < 4L), "matched inside the batch")
    // one verdict per new doc even when it collides in multiple bands
    assert(out.map(_._1).distinct.length == out.length)
  }

  test("simhash: exact dup -> hamming 0; unrelated -> large hamming") {
    val pairs = Dedup.simhashPairs(corpus, "doc_id", "text",
      maxHamming = 8, chunks = 4).collect()
    val m = pairs.map(r =>
      ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(m(((1L, 4L))) == 0)
    assert(!m.keySet.exists(p => p._1 == 3L || p._2 == 3L))
  }
}

class SimilaritySpec extends SparkSpec {

  private def vecs = {
    import spark.implicits._
    Seq(
      (1L, Array(1.0f, 0.0f, 0.0f), "a"),
      (2L, Array(0.9f, 0.1f, 0.0f), "a"), // close to 1
      (3L, Array(0.0f, 1.0f, 0.0f), "a"), // orthogonal to 1
      (4L, Array(-1.0f, 0.0f, 0.0f), "b") // opposite of 1
    ).toDF("vec_id", "embedding", "label")
  }

  test("brute-force top-k ranks by cosine") {
    val r = Similarity.bruteForceTopK(
      vecs.filter(col("vec_id") === 1), vecs, k = 3).collect()
    assert(r.map(_.getLong(2)).toSeq == Seq(2L, 3L, 4L))
    val cos = r.map(_.getDouble(3))
    assert(cos(0) > 0.99 && math.abs(cos(1)) < 1e-6 && cos(2) == -1.0)
  }

  test("k-means-trained IVF finds within-blob neighbors (matches brute top-1)") {
    import spark.implicits._
    // two tight, well-separated direction blobs; 2 trained cells align
    // with them, so a 1-cell probe must already agree with brute force
    val a = (0L until 10L).map(i => (i, Array(1.0f, 0.001f * i, 0f)))
    val b = (10L until 20L).map(i => (i, Array(0f, 0.001f * i, 1.0f)))
    val corpus = (a ++ b).toDF("vec_id", "embedding")
    val model = KMeans.train(corpus, k = 2, iters = 2)
    val queries = corpus.filter($"vec_id".isin(3L, 13L))
    val trained = Similarity.ivfTopKTrained(queries, corpus, 1, model, nProbe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val brute = Similarity.bruteForceTopK(queries, corpus, 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(trained == brute)
    assert(trained.keySet == Set(3L, 13L))
  }

  test("quantized cosine is exact for clean vectors") {
    import spark.implicits._
    val df = Seq((Array(3.0f, 4.0f), Array(3.0f, 4.0f))).toDF("a", "b")
    val c = df.select(Similarity.cosine(
      Similarity.quantize($"a"), Similarity.quantize($"b"))).collect().head.getDouble(0)
    assert(c == 1.0)
  }

  test("repetitionStats: permille shares of top token, top bigram, dups") {
    import spark.implicits._
    // "a a a b": top token a=3/4 -> 750; bigrams [a a, a a, a b]:
    // top 2/3 -> 666; distinct 2/4 -> dup 500
    val r = Seq(Tuple1("a a a b")).toDF("text")
      .select(graft.functions.Text.repetitionStats(TextOps.tokens($"text")))
      .collect().head.getSeq[Long](0)
    assert(r == Seq(750L, 666L, 500L))
    // single token: no bigrams -> 0; all tokens distinct -> dup 0
    val s = Seq(Tuple1("solo")).toDF("text")
      .select(graft.functions.Text.repetitionStats(TextOps.tokens($"text")))
      .collect().head.getSeq[Long](0)
    assert(s == Seq(1000L, 0L, 0L))
  }

  test("quantStats: scale, reconstruction error, saturation") {
    import spark.implicits._
    val r = Seq(Tuple1(Array(1.0f, -0.5f, 0.0f))).toDF("e")
      .select(graft.functions.Vectors.quantStatsCol($"e"))
      .collect().head.getSeq[Long](0)
    assert(r(0) == 3L) // dims
    assert(r(1) == 1000000L) // maxabs 1.0 in micro units
    // component 2: q = floor(-63.5 + 0.5) = -63, reconstruct -63/127
    val err = math.floor(math.abs(-0.5 - (-63.0) * 1.0 / 127.0) * 1e9).toLong
    assert(r(2) == err)
    assert(r(3) == 1L) // only the 1.0 component saturates to 127
    // zero vector: clamped scale, zero error, nothing saturates
    val z = Seq(Tuple1(Array(0.0f, 0.0f))).toDF("e")
      .select(graft.functions.Vectors.quantStatsCol($"e"))
      .collect().head.getSeq[Long](0)
    assert(z == Seq(2L, 0L, 0L, 0L))
  }

  test("sign-bucket LSH groups same-orthant vectors") {
    val r = Similarity.lshTopK(
      vecs.filter(col("vec_id") === 1), vecs, k = 3, planes = 3).collect()
    // sign bit is 1 for >= 0, so (1,0,0) and (0,1,0) share bucket "111";
    // only (-1,0,0) -> "011" is excluded
    assert(r.map(_.getLong(2)).toSeq == Seq(2L, 3L))
  }

  test("LSH-blocked cosine pairs: only same-bucket near-dups survive") {
    val r = Similarity.cosinePairsLsh(vecs, threshold = 0.4, planes = 3)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    // bucket "111": ids 1,2,3 — pair (1,2) cos ~0.994 passes, (1,3)/(2,3)
    // fail the threshold; id 4 is alone in "011" so its (high-cosine-with-
    // nothing) row can't appear; no pair crosses buckets
    assert(r == Set((1L, 2L)))
  }

  test("guarded cosine pairs: identical to exact when no block trips") {
    val exact = Similarity.cosinePairs(vecs, "label", 0.4)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val guarded = Similarity.cosinePairsGuarded(vecs, "label", 0.4,
      maxBlock = 100L)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(guarded == exact && exact == Set((1L, 2L)))
  }

  test("guarded cosine pairs: hot block diverts to label+sign-bucket blocking") {
    // maxBlock=2 trips label "a" (3 rows); the diverted path keeps
    // same-orthant pair (1,2) — exact verify unchanged — and "b" (1 row)
    // stays exact. Nothing crosses labels or buckets.
    val guarded = Similarity.cosinePairsGuarded(vecs, "label", 0.4,
      maxBlock = 2L, planes = 3)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(guarded == Set((1L, 2L)))
  }
}

class TextAnalysisSpec extends SparkSpec {

  test("quality score favors diverse natural text over repetition") {
    import spark.implicits._
    val df = Seq(
      ("nat", "the cat sat on a mat and it is nice to see the dog"),
      ("rep", "spam spam spam spam spam spam spam spam")
    ).toDF("id", "text")
    val m = df.select($"id",
      TextAnalysis.qualityScore(TextOps.tokens($"text")).as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("nat") > m("rep"))
    assert(m.values.forall(q => q >= 0.0 && q <= 1.0))
  }

  test("language prediction: clear stopword signals win; no signal -> und") {
    import spark.implicits._
    val df = Seq(
      ("en", "the cat is in the house and it is big"),
      ("de", "der hund ist ein guter hund und das ist gut"),
      ("fr", "le chat est un animal et la maison est grande"),
      ("es", "el perro es un animal y la casa es grande"),
      ("und", "lorem ipsum dolor sit amet consectetur")
    ).toDF("expect", "text")
    val rows = df.select($"expect",
      TextAnalysis.predictLang(TextOps.tokens($"text")).as("pred")).collect()
    rows.foreach(r => assert(r.getString(1) == r.getString(0)))
  }

  test("subword estimate: ceil(len/6) per word, min 1") {
    import spark.implicits._
    val df = Seq(("abcdefgh xy internationalization", 2L + 1L + 4L))
      .toDF("text", "expect")
    val r = df.select(
      TextAnalysis.subwordCountEstimate($"text").as("n"), $"expect").collect().head
    assert(r.getLong(0) == r.getLong(1))
  }
}

class MultimodalSpec extends SparkSpec {

  test("asMedia wraps text into binary payload with metadata") {
    import spark.implicits._
    val media = Multimodal.asMedia(
      Seq((7L, "hello")).toDF("doc_id", "text"), "doc_id", "text").collect().head
    assert(media.getLong(0) == 7L)
    assert(new String(media.getAs[Array[Byte]](1), "UTF-8") == "hello")
    assert(media.getLong(3) == 5L)
  }

  test("decodeStub is deterministic and partition-local") {
    import spark.implicits._
    val df = Seq((1L, "abc"), (2L, "defgh")).toDF("doc_id", "text")
    val d1 = Multimodal.decodeStub(Multimodal.asMedia(df, "doc_id", "text"))
      .orderBy("media_id").collect()
    val d2 = Multimodal.decodeStub(
      Multimodal.asMedia(df.repartition(3), "doc_id", "text"))
      .orderBy("media_id").collect()
    assert(d1.map(_.toString).toSeq == d2.map(_.toString).toSeq)
    assert(d1.head.getString(3).length == 32) // md5 hex
  }

  test("decodeBatched == decodeStub row-for-row, any batch size") {
    import spark.implicits._
    val df = (1 to 25).map(i => (i.toLong, s"payload-$i" * i))
      .toDF("doc_id", "text")
    val media = Multimodal.asMedia(df, "doc_id", "text")
    val single = Multimodal.decodeStub(media).orderBy("media_id")
      .collect().map(_.toString).toSeq
    for (bs <- Seq(1, 4, 64)) {
      val batched = Multimodal.decodeBatched(media, bs).orderBy("media_id")
        .collect().map(_.toString).toSeq
      assert(batched == single, s"batchSize=$bs diverges")
    }
  }

  test("encodePng -> imageIoCodec round-trips true pixel dimensions") {
    import spark.implicits._
    // awkward sizes on purpose: 1x1, prime dims, wide/tall aspect
    val dims = Seq((1L, 1, 1), (2L, 17, 3), (3L, 64, 31), (4L, 5, 48))
      .toDF("media_id", "w", "h")
    val media = Multimodal.encodePng(dims, "media_id", "w", "h")
    // payloads are REAL PNGs (magic bytes), not fakes
    val heads = media.orderBy("media_id").collect()
    assert(heads.forall { r =>
      val b = r.getAs[Array[Byte]](1)
      (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G'
    })
    assert(heads.forall(_.getString(2) == "image/png"))
    for (bs <- Seq(1, 3, 64)) {
      val got = Multimodal
        .decodeBatched(media, bs, codec = Multimodal.imageIoCodec)
        .orderBy("media_id")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
      assert(got == Seq((1L, 1, 1), (2L, 17, 3), (3L, 64, 31), (4L, 5, 48)),
        s"batchSize=$bs misread dimensions")
    }
  }

  test("encodePng payloads are deterministic across partitionings") {
    import spark.implicits._
    val dims = (1L to 20L).map(i => (i, 4 + (i % 7).toInt, 3 + (i % 5).toInt))
      .toDF("media_id", "w", "h")
    val h1 = Multimodal.encodePng(dims, "media_id", "w", "h")
      .orderBy("media_id").collect()
      .map(r => java.util.Arrays.hashCode(r.getAs[Array[Byte]](1))).toSeq
    val h2 = Multimodal.encodePng(dims.repartition(5), "media_id", "w", "h")
      .orderBy("media_id").collect()
      .map(r => java.util.Arrays.hashCode(r.getAs[Array[Byte]](1))).toSeq
    assert(h1 == h2)
  }

  test("sampleFrames emits every step-th frame") {
    import spark.implicits._
    val media = Seq((1L, 10L)).toDF("media_id", "n_frames")
    val frames = Multimodal.sampleFrames(media, "n_frames", 3)
      .select("frame_idx").collect().map(_.getLong(0)).toSeq
    assert(frames == Seq(0L, 3L, 6L, 9L))
  }

  test("encodeWav -> wavCodec round-trips real RIFF audio with exact stats") {
    import spark.implicits._
    val spec = Seq((7L, 5)).toDF("media_id", "n_samples")
    val media = Multimodal.encodeWav(spec, "media_id", "n_samples")
    val payload = media.collect().head.getAs[Array[Byte]](1)
    // a REAL RIFF/WAVE container, not a hand-rolled fake
    assert(new String(payload.take(4), "US-ASCII") == "RIFF")
    assert(new String(payload.slice(8, 12), "US-ASCII") == "WAVE")
    // expected stats straight from the fixture pattern
    val samples = (0 until 5).map(i =>
      ((7L * 2654435761L + i * 2246822519L) & 0xffff) - 32768L)
    val got = Multimodal.decodeWavBatched(media).collect().head
    assert(got.getLong(0) == 7L)
    assert(got.getInt(1) == 8000)
    assert(got.getLong(2) == 5L)
    assert(got.getLong(3) == samples.map(math.abs).max)
    assert(got.getLong(4) == samples.map(math.abs).sum)
  }

  test("wavRiffCodec == wavCodec (javax.sound reference) on varied fixtures") {
    import spark.implicits._
    // varied lengths (odd data sizes exercise even-chunk padding) and
    // seeds; both codecs must agree byte-for-byte on every stat
    val spec = (1L to 40L).map(i => (i, 1 + (i * 7 % 97).toInt))
      .toDF("media_id", "n_samples")
    val media = Multimodal.encodeWav(spec, "media_id", "n_samples")
    def rows(codec: Seq[(Long, Array[Byte])] => Seq[org.apache.spark.sql.Row]) =
      Multimodal.decodeBatched(media, 16, codec, Multimodal.decodedAudioSchema)
        .orderBy("media_id").collect().map(_.toString).toSeq
    assert(rows(Multimodal.wavRiffCodec) == rows(Multimodal.wavCodec))
  }

  test("wavRiffCodec rejects non-WAV and non-PCM16 payloads loudly") {
    val notRiff = "JUNKJUNKJUNKJUNK".getBytes("US-ASCII")
    val e1 = intercept[IllegalArgumentException](
      Multimodal.wavRiffCodec(Seq((1L, notRiff))))
    assert(e1.getMessage.contains("RIFF"))
  }

  test("decodeWavBatched is batch-size invariant") {
    import spark.implicits._
    val spec = (1L to 20L).map(i => (i, 8 + (i % 13).toInt))
      .toDF("media_id", "n_samples")
    val media = Multimodal.encodeWav(spec, "media_id", "n_samples")
    def stats(bs: Int) = Multimodal.decodeWavBatched(media, bs)
      .orderBy("media_id").collect().map(_.toString).toSeq
    assert(stats(1) == stats(64))
  }

  test("phashCodec: same seed+dims => same hash; hashes deterministic") {
    import spark.implicits._
    // ids 1 and 3 share seed+dims (planted dup); 2 differs
    val dims = Seq((1L, 20, 12, 7L), (2L, 20, 12, 8L), (3L, 20, 12, 7L))
      .toDF("media_id", "w", "h", "seed")
    val media = Multimodal.encodePng(dims, "media_id", "w", "h", Some("seed"))
    def hashes(bs: Int) = Multimodal
      .decodeBatched(media, bs, codec = Multimodal.phashCodec)
      .orderBy("media_id").collect()
      .map(r => (r.getLong(0), r.getString(3))).toSeq
    val h = hashes(64)
    assert(h.map(_._2).forall(_.length == 16))
    assert(h(0)._2 == h(2)._2, "same seed+dims must fingerprint equal")
    assert(h(0)._2 != h(1)._2, "different seeds must diverge")
    assert(hashes(1) == h, "batch size must not change fingerprints")
  }

  test("phashPairs: planted dups survive, ordering and threshold hold") {
    import spark.implicits._
    val dims = ((1L to 6L).map(i => (i, 18, 16, i % 3)))
      .toDF("media_id", "w", "h", "seed")
    val media = Multimodal.encodePng(dims, "media_id", "w", "h", Some("seed"))
    val decoded = Multimodal.decodeBatched(media, codec = Multimodal.phashCodec)
    val pairs = Multimodal.phashPairs(decoded, maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // seeds repeat mod 3: (1,4), (2,5), (3,6) are identical images
    assert(pairs.toSet == Set((1L, 4L, 0L), (2L, 5L, 0L), (3L, 6L, 0L)))
    assert(pairs.forall(p => p._1 < p._2))
  }

  test("encodeAviPng builds a real RIFF/AVI that parseAvi round-trips") {
    import spark.implicits._
    val dims = Seq((1L, 12, 10, 4, 5L), (2L, 20, 8, 2, 9L))
      .toDF("media_id", "w", "h", "nf", "seed")
    val media = Multimodal.encodeAviPng(
      dims, "media_id", "w", "h", "nf", Some("seed"))
    val rows = media.orderBy("media_id").collect()
    rows.foreach { r =>
      val b = r.getAs[Array[Byte]](1)
      assert(new String(b.take(4), "US-ASCII") == "RIFF")
      assert(new String(b.slice(8, 12), "US-ASCII") == "AVI ")
      assert(r.getString(2) == "video/x-msvideo")
    }
    val avi = Multimodal.parseAvi(rows.head.getAs[Array[Byte]](1))
    assert(avi.width == 12 && avi.height == 10 && avi.totalFrames == 4)
    assert(avi.frames.length == 4)
    // every frame chunk is a real PNG the JDK can decode
    avi.frames.foreach { f =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f))
      assert(img != null && img.getWidth == 12 && img.getHeight == 10)
    }
    intercept[IllegalArgumentException](
      Multimodal.parseAvi("not a video".getBytes("UTF-8")))
  }

  test("aviVideoCodec: frame hashes match the per-frame PNG path; motion exact") {
    import spark.implicits._
    val dims = Seq((1L, 18, 16, 3, 7L)).toDF("media_id", "w", "h", "nf", "seed")
    val media = Multimodal.encodeAviPng(
      dims, "media_id", "w", "h", "nf", Some("seed"))
    val dec = Multimodal.decodeAviBatched(media, step = 1)
      .orderBy("frame_idx").collect()
    assert(dec.length == 3)
    assert(dec.forall(r => r.getInt(1) == 18 && r.getInt(2) == 16 &&
      r.getInt(3) == 3))
    // frame f's hash must equal the dHash of a standalone PNG with the
    // same per-frame seed — image and video fingerprints are comparable
    val pngSeeds = Seq((0L, 18, 16, 7L * 1000003L + 0),
      (1L, 18, 16, 7L * 1000003L + 1), (2L, 18, 16, 7L * 1000003L + 2))
      .toDF("media_id", "w", "h", "seed")
    val pngHashes = Multimodal.decodeBatched(
      Multimodal.encodePng(pngSeeds, "media_id", "w", "h", Some("seed")),
      codec = Multimodal.phashCodec)
      .orderBy("media_id").collect().map(_.getString(3)).toSeq
    assert(dec.map(_.getString(5)).toSeq == pngHashes)
    // motion: 0 for the first sample, positive after (scrambled frames)
    assert(dec.head.getLong(7) == 0L)
    assert(dec.tail.forall(_.getLong(7) > 0L))
    // batch-size and step invariants
    val sampled = Multimodal.decodeAviBatched(media, step = 2)
      .orderBy("frame_idx").collect().map(_.getInt(4)).toSeq
    assert(sampled == Seq(0, 2))
  }

  test("still videos (staticCol) decode with motion exactly 0") {
    import spark.implicits._
    val dims = Seq((1L, 14, 12, 4, 3L, true), (2L, 14, 12, 4, 3L, false))
      .toDF("media_id", "w", "h", "nf", "seed", "still")
    val media = Multimodal.encodeAviPng(
      dims, "media_id", "w", "h", "nf", Some("seed"), Some("still"))
    val dec = Multimodal.decodeAviBatched(media, step = 1).collect()
    val still = dec.filter(_.getLong(0) == 1L)
    val moving = dec.filter(_.getLong(0) == 2L)
    assert(still.forall(_.getLong(7) == 0L))
    assert(still.map(_.getString(5)).distinct.length == 1) // one frozen frame
    assert(moving.count(_.getLong(7) > 0L) == 3)
  }

  test("vocab-cached BPE == direct per-row kernel (p70/p71 equivalence)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "the customer batch hash scan"),
      (2L, "stream stream query order"),
      (3L, ""), // empty text -> [""] token, zero chars, zero tokens
      (4L, "zzz unknown alphabet"),
      (5L, "erer eeer")
    ).toDF("doc_id", "text")
    val direct = docs.select($"doc_id".as("doc"),
      size(TextOps.tokens($"text")).cast("long").as("n_words"),
      length(regexp_replace($"text", " ", "")).cast("long").as("n_chars"),
      graft.functions.Text.bpeCount(TextOps.tokens($"text"))
        .as("bpe_tokens"))
    val cached = Vocab.bpeTokensCached(docs, "doc_id", "text")
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(direct.collect().map(key).toSet ===
      cached.select("doc", "n_words", "n_chars", "bpe_tokens")
        .collect().map(key).toSet)
  }
}
