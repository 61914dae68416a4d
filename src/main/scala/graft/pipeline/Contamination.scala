package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection: which candidate training documents
  * share verbatim n-grams with a held-out / evaluation set? The standard
  * decontamination pass of an LLM data pipeline (e.g. drop training docs
  * overlapping any test shingle).
  *
  * SCALE: both sides reduce to (doc_id, md5(shingle)) BEFORE any
  * shuffle — the join carries fixed-width hashes, never text. The
  * held-out side is distinct shingle hashes only (no ids), typically
  * orders of magnitude smaller than the training corpus; Spark/AQE
  * broadcasts it when it fits and hash-joins otherwise — either way the
  * training corpus shuffles at most once, keyed by hash.
  */
object Contamination {

  /** Per-training-doc count of distinct n-gram shingles that appear
    * anywhere in `heldOut`. Docs with zero hits are absent — the result
    * is the contamination report, not a full-corpus annotation (join it
    * back left-anti style to drop contaminated docs).
    *
    * @return (doc_id, n_hits)
    */
  def shingleHits(
      train: DataFrame, heldOut: DataFrame, nGram: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // distinct shingles per doc, hashed AFTER the generator so md5 runs
    // on the exploded column inside codegen (a transform() lambda would
    // be an interpreted HOF)
    // widen first (r16): tokenize+shingle+md5 is the compute-dense
    // stage, and a compressed text table is a handful of byte-sized
    // parquet splits — at sf10 the whole shingle pass of both sides ran
    // in ONE task. Pass-through at real scale (see Par.widen).
    def hashes(d: DataFrame) = Par.widen(d.select(col(idCol), col(textCol)))
      .select(col(idCol).as("doc_id"),
        explode(array_distinct(
          TextOps.shingles(TextOps.tokens(col(textCol)), nGram))).as("s"))
      .select(col("doc_id"), md5(col("s")).as("h"))
    val tr = hashes(train)
    val te = hashes(heldOut).select(col("h")).distinct()
    tr.join(te, "h")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
  }

  /** [[shingleHits]] with a broadcast Bloom-filter pre-filter on the
    * training side — the shape that holds at 100 TB when even the
    * held-out DISTINCT hash set is too big to broadcast cheaply: the
    * filter is `numBits/8` bytes TOTAL regardless of held-out
    * cardinality, the corpus's shingle stream probes it inside the
    * scan's codegen pass, and only true hits plus the ~1% false-
    * positive residue ever reach the exchange. The exact equi-join
    * against the held-out hashes then removes the residue (a Bloom
    * filter has no false negatives), so the output is bit-identical to
    * [[shingleHits]] — same oracle, different (much cheaper) plan.
    *
    * The same [[graft.functions.Bloom]] aggregate is mergeable
    * (bitwise OR), so held-out splits arriving incrementally — a
    * streaming micro-batch per benchmark release — fold into the one
    * filter without rebuilding.
    */
  def bloomShingleHits(
      train: DataFrame, heldOut: DataFrame, nGram: Int = 3,
      numBits: Int = 0, numHashes: Int = 6,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // widened for the same single-split reason as [[shingleHits]]
    def hashes(d: DataFrame) = Par.widen(d.select(col(idCol), col(textCol)))
      .select(col(idCol).as("doc_id"),
        explode(array_distinct(
          TextOps.shingles(TextOps.tokens(col(textCol)), nGram))).as("s"))
      .select(col("doc_id"), md5(col("s")).as("h"))
    val tr = hashes(train)
    val te0 = hashes(heldOut).select(col("h")).distinct()
    // numBits <= 0 (the default) sizes the filter to the DATA: a fixed
    // size saturates once held-out cardinality outgrows it (FP -> 1)
    // and the prefilter silently degrades to a no-op — measured: 2^20
    // bits vs ~2.5M held-out 4-grams at sf10 admits everything. 10
    // bits/key holds ~1% FP at k=6; the broadcast is then n*1.25 bytes
    // (~3 MiB at sf10), capped at 128 MiB (beyond which pass an
    // explicit size or fall back to the exact join). The sizing count
    // doubles as the materialization of the persisted held-out hashes,
    // which the bloom build and the verify join then both reuse —
    // unpersist is the caller's lifecycle (the bench loop sweeps it).
    val te = if (numBits > 0) te0 else te0.persist()
    val bits =
      if (numBits > 0) numBits
      else math.min(1L << 30, math.max(1L << 20, te.count() * 10L)).toInt
    val bloom = te.agg(graft.functions.Bloom.build(
      col("h"), bits, numHashes).as("bf"))
    val pre = tr.join(broadcast(bloom))
      .where(graft.functions.Bloom.contains(col("bf"), col("h")))
      .drop("bf")
    pre.join(te, "h")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
  }

  /** Per-document duplicated-span fraction: the share of a doc's n-gram
    * WINDOWS (every position, duplicates kept — unlike the distinct
    * shingle sets above) whose hash occurs >= `minCount` times anywhere
    * in the corpus, including inside the same document. The
    * window-level analog of exact-substring training-data dedup (Lee et
    * al., "Deduplicating Training Data Makes Language Models Better",
    * ACL 2022): a high `dup_frac` doc is mostly text that exists
    * verbatim elsewhere and is a drop/trim candidate, even when no
    * whole-document or shingle-SET near-dup fires.
    *
    * SCALE: identical shape to [[boilerplateStats]] — one shuffle keyed
    * by the md5 window hash (an unordered window count, so the
    * scan/shingle subtree is built once), then a per-doc groupBy with
    * map-side partial aggregation. Raw text never shuffles; the
    * quadratic "compare every span pair" formulation never appears.
    *
    * @return (doc_id, n_windows, n_dup, dup_frac)
    */
  def dupSpanStats(
      docs: DataFrame, nGram: Int = 8, minCount: Int = 2,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sh = Par.widen(docs.select(col(idCol), col(textCol)))
      .select(col(idCol).as("doc_id"),
        explode(TextOps.shingles(TextOps.tokens(col(textCol)), nGram)).as("s"))
      .select(col("doc_id"), md5(col("s")).as("h"))
    val withCnt = sh.withColumn("cnt",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("h"))))
    withCnt.groupBy("doc_id").agg(
        count(lit(1)).as("n_windows"),
        sum(when(col("cnt") >= minCount, 1L).otherwise(0L)).as("n_dup"))
      .withColumn("dup_frac",
        col("n_dup").cast("double") / col("n_windows"))
  }

  /** Pairwise source-overlap matrix: n-gram Jaccard similarity between
    * every pair of corpus sources (domains / crawls / snapshots) over
    * their DISTINCT shingle-hash sets — the cross-source leakage audit
    * run before mixing sources into a training corpus (two "different"
    * sources with high Jaccard are the same crawl twice, and their
    * mixture weights double-count).
    *
    * SCALE: one shuffle keyed by shingle hash; per-hash state is the
    * SET OF SOURCES containing it, bounded by the source count (tens to
    * thousands — never corpus-proportional), and the pair expansion is
    * per-hash quadratic in that bounded set, not in documents. Source
    * sizes are a separate vocabulary-style aggregate, broadcast back
    * onto the (|sources| choose 2)-row pair table. Text never shuffles.
    *
    * @return (src_a, src_b, n_a, n_b, inter, jaccard) for pairs with
    *         at least one shared shingle, src_a < src_b
    */
  def sourceOverlap(
      docs: DataFrame, nGram: Int = 3,
      srcCol: String = "source", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // The source universe is O(nsrc) metadata (the OUTPUT is nsrc^2
    // rows, so nsrc is small by construction) — collect it once and
    // assign each source a bit. The corpus-scale aggregate then
    // carries a BITMASK per hash instead of a string set: bit_or
    // partial-aggregates map-side exactly like the set union, but its
    // shuffle value is ceil(nsrc/62) longs (one long for <= 62 sources,
    // a short array above — the source universe is data-driven, so the
    // mask is SEGMENTED rather than capped: source i owns bit i%62 of
    // word i/62, each doc row touches exactly one word, and bit_or per
    // word is the same union). Everything downstream of the h-shuffle
    // (pair expansion, per-source totals) collapses to arithmetic over
    // the distinct-mask count table instead of a second corpus-scale
    // explode+shuffle. Grouping stays keyed on md5 — as 16-byte unhex
    // binary, a bijection of the hex string, so NO added collision
    // risk (shrinking to a 64-bit key was considered and rejected for
    // exactly that risk) — and the result is row-identical to the set
    // formulation (measured 82.5 s -> 60.6 s isolated at sf10, hash
    // unchanged).
    val srcNames = docs.select(col(srcCol).cast("string").as("src"))
      .where(col("src").isNotNull)
      .distinct().collect().map(_.getString(0)).sorted // O(nsrc) pull
    val BitsPerWord = 62
    val nWords = math.max(1, (srcNames.length + BitsPerWord - 1) / BitsPerWord)
    val wordMap = srcNames.zipWithIndex
      .map { case (s, i) => s -> (i / BitsPerWord) }.toMap
    val bitMap = srcNames.zipWithIndex
      .map { case (s, i) => s -> (1L << (i % BitsPerWord)) }.toMap
    val sh = Par.widen(docs.select(col(srcCol), col(textCol)))
      .select(element_at(typedLit(wordMap), col(srcCol).cast("string"))
          .as("w"),
        element_at(typedLit(bitMap), col(srcCol).cast("string")).as("bit"),
        explode(array_distinct(
          TextOps.shingles(TextOps.tokens(col(textCol)), nGram))).as("s"))
      .where(col("bit").isNotNull) // null source contributes nothing
      .select(col("w"), col("bit"), unhex(md5(col("s"))).as("h"))
    // the ONE corpus-scale shuffle: (16-byte h) -> segmented bitmask
    // (each row feeds its own word; the others bit_or in 0), then the
    // distinct masks collapse to counts. The aggregate's group count is
    // ~the distinct shingle-hash count — corpus-proportional — so the
    // exchange must scale with input, not sit at the session's fixed
    // partition count: at sf30, 32 partitions put ~5M groups of
    // (16-byte key + masks) in every task's hash map and the aggregate
    // fell off the memory cliff (measured 4.7 s sf10 -> 70.8 s sf30,
    // 15x on 3x data; scaled: see OPTIMIZATION_r16.md). Same
    // Par.scaledShuffleParts posture as the MinHash verify join.
    val parts = Par.scaledShuffleParts(
      docs.select(col(srcCol), col(textCol)))
    val wordAggs = (0 until nWords).map(w =>
      expr(s"bit_or(if(w = $w, bit, 0L))").as(s"m$w"))
    val perHash = sh.repartition(parts, col("h")).groupBy(col("h"))
      .agg(wordAggs.head, wordAggs.tail: _*)
    val maskCol =
      if (nWords == 1) col("m0")
      else array((0 until nWords).map(w => col(s"m$w")): _*)
    val byMask = perHash.select(maskCol.as("m"))
      .groupBy(col("m")).agg(count(lit(1)).as("cnt"))
    val dict = srcNames.zipWithIndex
      .map { case (s, i) => (s, i, i / BitsPerWord, 1L << (i % BitsPerWord)) }
      .toSeq.toDF("src", "i", "wv", "bitv")
    def hasBit(m: Column, wv: Column, bitv: Column): Column = {
      val word = if (nWords == 1) m else element_at(m, wv + lit(1))
      word.bitwiseAND(bitv) =!= lit(0L)
    }
    // per-source totals and pairwise intersections are sums over the
    // tiny mask-count table — both frames are broadcast-sized
    val perSrc = byMask
      .join(broadcast(dict), hasBit(col("m"), col("wv"), col("bitv")))
      .groupBy(col("src")).agg(sum(col("cnt")).as("n"))
    val pairs = byMask
      .join(broadcast(dict.select(col("src").as("src_a"), col("i").as("ia"),
        col("wv").as("wa"), col("bitv").as("ba"))),
        hasBit(col("m"), col("wa"), col("ba")))
      .join(broadcast(dict.select(col("src").as("src_b"), col("i").as("ib"),
        col("wv").as("wb"), col("bitv").as("bb"))),
        hasBit(col("m"), col("wb"), col("bb")) && col("ia") < col("ib"))
      .groupBy(col("src_a"), col("src_b")).agg(sum(col("cnt")).as("inter"))
    pairs
      .join(broadcast(perSrc.select(col("src").as("src_a"),
        col("n").as("n_a"))), "src_a")
      .join(broadcast(perSrc.select(col("src").as("src_b"),
        col("n").as("n_b"))), "src_b")
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
        col("inter"),
        (col("inter").cast("double") /
          (col("n_a") + col("n_b") - col("inter")).cast("double"))
          .as("jaccard"))
  }

  /** Per-document boilerplate fraction: the share of a doc's distinct
    * n-gram shingles that are corpus-frequent (appearing in >= `minDf`
    * docs) — the "repeated template/navigation text" signal web-corpus
    * curation drops docs on. Docs shorter than `nGram` words have no
    * shingles and are absent from the result.
    *
    * SCALE: document frequency is a hash-keyed groupBy (shingles are
    * distinct per doc, so count(*) IS the doc frequency), and the
    * join back to per-doc shingles carries (doc_id, hash, df) only —
    * no text shuffles anywhere.
    *
    * @return (doc_id, n_shingles, n_boiler, boiler_frac)
    */
  def boilerplateStats(
      docs: DataFrame, nGram: Int = 5, minDf: Int = 10,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sh = Par.widen(docs.select(col(idCol), col(textCol)))
      .select(col(idCol).as("doc_id"),
        explode(array_distinct(
          TextOps.shingles(TextOps.tokens(col(textCol)), nGram))).as("s"))
      .select(col("doc_id"), md5(col("s")).as("h"))
    // doc frequency as an unordered window count over the hash: ONE
    // computation of the shingle table and one h-shuffle, instead of a
    // groupBy + join that rebuilds the scan/shingle/md5 subtree twice
    val withDf = sh.withColumn("df",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("h"))))
    withDf.groupBy("doc_id").agg(
        count(lit(1)).as("n_shingles"),
        sum(when(col("df") >= minDf, 1L).otherwise(0L)).as("n_boiler"))
      .withColumn("boiler_frac",
        col("n_boiler").cast("double") / col("n_shingles"))
  }
}
