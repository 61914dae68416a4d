package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for document corpora — exact, MinHash+LSH,
  * SimHash, n-gram Jaccard. All set-oriented; candidate generation is
  * always hash-bucket join (never all-pairs), so cost scales with
  * bucket collision counts, not n².
  */
object Dedup {

  /** Exact dedup on content hash: one row per distinct text, keeping the
    * smallest id (deterministic survivor). Grouping on md5(text) keeps
    * the shuffle key fixed-width — at 100 TB the text never shuffles. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Event-log dedup: keep the FIRST row per key within each tumbling
    * event-time window — the batch twin of Structured Streaming's
    * `dropDuplicatesWithinWatermark` (StatefulOps.dedupByContent), and
    * the standard collapse of retry/refresh storms before sessionizing
    * an interaction log. Survivor = earliest (ts, id) in the bucket,
    * so the result is deterministic under any partitioning.
    *
    * SCALE: the ranking window partitions by (keys..., bucket) — tens
    * of rows per partition in any real log, never corpus-proportional;
    * one shuffle on those compound keys. No global window anywhere.
    *
    * @return input rows that survive, plus their `win_bucket`
    */
  def firstPerWindow(
      events: DataFrame, keyCols: Seq[String], tsCol: String,
      idCol: String, windowSec: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy((keyCols.map(col) :+ col("win_bucket")): _*)
      .orderBy(col(tsCol), col(idCol))
    events
      .withColumn("win_bucket",
        floor(unix_timestamp(col(tsCol)) / windowSec).cast("long"))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** MinHash+LSH near-duplicate pairs.
    *
    * shingle(nGram) -> k-permutation MinHash signature -> `bands` LSH
    * band keys -> bucket self-join on (band, key) -> exact shingle-set
    * Jaccard verification >= threshold.
    *
    * SCALE: three stages with deliberately thin shuffles —
    *  1. candidate generation joins ONLY (band, bkey, doc_id): fixed-width
    *     hash keys, never text or shingles;
    *  2. candidate pairs dedup on (doc_a, doc_b) BEFORE any verification,
    *     so a pair colliding in all bands verifies once, not `bands` times;
    *  3. the exact-Jaccard verify joins shingle sets back by doc id —
    *     shingles shuffle once, and only for docs that are in >=1 pair.
    * With sane banding the candidate set is ~linear in true duplicates.
    */
  /** Shared MinHash stage: (doc, shingle_set) plus the exploded
    * (doc, band, bkey) LSH bucket keys. The text scan is widened first —
    * shingle+minhash is the compute-dense stage and must not be bound by
    * byte-sized parquet splits. */
  private[graft] def minhashBuckets(
      df: DataFrame, idCol: String, textCol: String,
      nGram: Int, k: Int, bands: Int): (DataFrame, DataFrame) = {
    val sh = TextOps.shingles(TextOps.tokens(col(textCol)), nGram)
    val shingleSets = Par.widen(df.select(col(idCol), col(textCol)))
      .select(
        col(idCol).as("doc"),
        array_distinct(sh).as("shingle_set"))
      .where(size(col("shingle_set")) > 0)
    val buckets = shingleSets
      .withColumn("sig", TextOps.minhashSignature(col("shingle_set"), k))
      .select(col("doc"),
        posexplode(TextOps.bandKeys(col("sig"), bands, k / bands))
          .as(Seq("band", "bkey")))
    (shingleSets, buckets)
  }

  def minhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      nGram: Int = 3,
      k: Int = 6,
      bands: Int = 3,
      threshold: Double = 0.2): DataFrame = {
    val (shingleSets, buckets) =
      minhashBuckets(df, idCol, textCol, nGram, k, bands)
    val a = buckets.as("a")
    val b = buckets.as("b")
    val candidates = a.join(b,
      col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
        col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
      .distinct()
    // The verify join carries the WIDE shingle-set arrays, so its
    // shuffle partition count must scale with input bytes, not sit at
    // the session's fixed value (VERDICT r14 task 5: at sf30 this was
    // the one superlinear stage in the tree — 32 oversized partitions
    // spilling, not algorithm). Hash-repartitioning the wide side on
    // the join key makes EnsureRequirements shuffle the thin candidate
    // side up to match. At the 8 MB/partition target the scaled count
    // starts to exceed a 32-partition session above ~256 MB of
    // column-pruned (id, text) input — around sf1-sf3 for this corpus;
    // below that `parts` == the session value and the shuffle shape is
    // unchanged.
    val parts = Par.scaledShuffleParts(
      df.select(col(idCol), col(textCol)))
    val sa = shingleSets.select(
      col("doc").as("doc_a"), col("shingle_set").as("ss_a"))
      .repartition(parts, col("doc_a"))
    val sb = shingleSets.select(
      col("doc").as("doc_b"), col("shingle_set").as("ss_b"))
      .repartition(parts, col("doc_b"))
    candidates
      .join(sa, "doc_a").join(sb, "doc_b")
      .select(col("doc_a"), col("doc_b"),
        TextOps.jaccard(col("ss_a"), col("ss_b")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Frequency-capped MinHash+LSH near-dup pairs — [[minhashPairs]] with
    * the two defenses a boilerplate-heavy web corpus needs, where the
    * plain candidate self-join is quadratic in the largest band bucket
    * (10⁵-10⁶ near-identical pages landing one band key would square):
    *
    *  1. EXACT-CONTENT COLLAPSE first: docs with identical shingle sets
    *     are interchangeable w.r.t. Jaccard (same similarity to every
    *     third doc), so each content group enters LSH as ONE delegate
    *     (min id), and members attach by linear star pairs
    *     (delegate, member, 1.0). This alone deflates the dominant skew
    *     mode — exact-duplicate boilerplate — from O(g²) to O(g).
    *  2. BUCKET CAP on what remains: a band bucket holding more than
    *     `bucketCap` DISTINCT-content delegates is a low-information
    *     band key (stop-shingle boilerplate); it is diverted out of the
    *     candidate join entirely. Diverted buckets are observable via
    *     [[minhashHotBuckets]] — log/alert on them, never self-join
    *     them raw. A pair lost to one diverted band can still meet in
    *     its `bands - 1` other buckets.
    *
    * The result is COMPONENT-PRESERVING vs [[minhashPairs]] whenever no
    * bucket trips the cap: every uncapped pair (a,b) is represented by
    * the star path and/or the delegates' verified pair, so connected
    * components — and any "has a lower-id near-dup" survivor predicate —
    * come out identical; only the raw pair list is thinner (star, not
    * clique, inside exact groups). With the cap tripping, recall is
    * deliberately traded on the flagged buckets only.
    *
    * SCALE: candidate work is bounded by bucketCap² per bucket; star
    * pairs are linear; the collapse groupBy shuffles one fixed-width
    * md5 key per doc. */
  def minhashPairsCapped(
      df: DataFrame, idCol: String, textCol: String,
      nGram: Int = 3, k: Int = 6, bands: Int = 3,
      threshold: Double = 0.2, bucketCap: Int = 1000): DataFrame = {
    val (withCh, star, kept) =
      cappedParts(df, idCol, textCol, nGram, k, bands, bucketCap)
    val candidates = kept.as("a").join(kept.as("b"),
      col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
        col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
      .distinct()
    val sa = withCh.select(col("doc").as("doc_a"), col("shingle_set").as("ss_a"))
    val sb = withCh.select(col("doc").as("doc_b"), col("shingle_set").as("ss_b"))
    val verified = candidates
      .join(sa, "doc_a").join(sb, "doc_b")
      .select(col("doc_a"), col("doc_b"),
        TextOps.jaccard(col("ss_a"), col("ss_b")).as("jaccard"))
      .where(col("jaccard") >= threshold)
    star.unionAll(verified)
  }

  /** The band buckets [[minhashPairsCapped]] diverted: (band, bkey,
    * n_delegates) with n_delegates > bucketCap. Empty = no skew; rows
    * here are the corpus's boilerplate band keys and belong in the
    * ingest run's log/metrics. */
  def minhashHotBuckets(
      df: DataFrame, idCol: String, textCol: String,
      nGram: Int = 3, k: Int = 6, bands: Int = 3,
      bucketCap: Int = 1000): DataFrame = {
    val (_, _, _, sizes) =
      cappedPartsWithSizes(df, idCol, textCol, nGram, k, bands)
    sizes.where(col("__n") > bucketCap)
      .select(col("band"), col("bkey"), col("__n").as("n_delegates"))
  }

  /** Shared stages of the capped path: shingled docs with content key,
    * linear star pairs, and the delegate band rows that survive the
    * bucket cap. */
  private def cappedParts(
      df: DataFrame, idCol: String, textCol: String,
      nGram: Int, k: Int, bands: Int, bucketCap: Int)
      : (DataFrame, DataFrame, DataFrame) = {
    val (withCh, star, dBuckets, sizes) =
      cappedPartsWithSizes(df, idCol, textCol, nGram, k, bands)
    val kept = dBuckets.join(
      sizes.where(col("__n") <= bucketCap).select(col("band"), col("bkey")),
      Seq("band", "bkey"))
    (withCh, star, kept)
  }

  private def cappedPartsWithSizes(
      df: DataFrame, idCol: String, textCol: String,
      nGram: Int, k: Int, bands: Int)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val (sh, _) = minhashBuckets(df, idCol, textCol, nGram, k, bands)
    // content key: identical shingle SETS collapse (sort first — set
    // equality, not element order). Cross-engine parity of the key value
    // is irrelevant: it only groups within one engine.
    val withCh = sh.withColumn("ch",
      md5(concat_ws("\u0001", array_sort(col("shingle_set")))))
    val deleg = withCh.groupBy(col("ch")).agg(min(col("doc")).as("__d"))
    val delegRows = withCh.join(deleg, "ch")
    val star = delegRows.where(col("doc") =!= col("__d"))
      .select(col("__d").as("doc_a"), col("doc").as("doc_b"),
        lit(1.0).as("jaccard"))
    val dSh = delegRows.where(col("doc") === col("__d"))
      .select(col("doc"), col("shingle_set"))
    val dBuckets = dSh
      .withColumn("sig", TextOps.minhashSignature(col("shingle_set"), k))
      .select(col("doc"),
        posexplode(TextOps.bandKeys(col("sig"), bands, k / bands))
          .as(Seq("band", "bkey")))
    val sizes = dBuckets.groupBy(col("band"), col("bkey"))
      .agg(count(lit(1)).as("__n"))
    (withCh, star, dBuckets, sizes)
  }

  /** Incremental NEAR-dup: a new batch checked against the standing
    * corpus with MinHash+LSH — the near-dup twin of the exact
    * new-vs-corpus hash join (p43). Per new doc, the verdict is its
    * lowest-id corpus near-duplicate at Jaccard >= threshold (the same
    * deterministic keep-lowest-id survivor convention as exact dedup):
    * anti-join the result against the batch to admit only novel docs.
    *
    * SCALE: this is why LSH dedup stays INCREMENTAL at 100 TB — the
    * corpus's (band, bkey) index is write-once (persist `buckets` +
    * `shingle_set` partitioned by band key, exactly the
    * [[graft.pipeline.Similarity.writeBucketedCorpus]] shape) and each
    * arriving batch probes it with a |batch|-proportional equi-join;
    * nothing ever re-pairs corpus-vs-corpus. Candidates dedup on
    * (new_doc, dup_of) before the Jaccard verify; the final per-new-doc
    * min is a partial-agg'd struct min, never a window. */
  def minhashNewVsCorpus(
      newDf: DataFrame,
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      nGram: Int = 3,
      k: Int = 6,
      bands: Int = 3,
      threshold: Double = 0.2): DataFrame = {
    val (shNew, bNew) = minhashBuckets(newDf, idCol, textCol, nGram, k, bands)
    val (shCor, bCor) = minhashBuckets(corpus, idCol, textCol, nGram, k, bands)
    val candidates = bNew.as("a").join(bCor.as("b"),
      col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey"))
      .select(col("a.doc").as("new_doc"), col("b.doc").as("dup_of"))
      .distinct()
    val sa = shNew.select(col("doc").as("new_doc"), col("shingle_set").as("ss_a"))
    val sb = shCor.select(col("doc").as("dup_of"), col("shingle_set").as("ss_b"))
    candidates
      .join(sa, "new_doc").join(sb, "dup_of")
      .select(col("new_doc"), col("dup_of"),
        TextOps.jaccard(col("ss_a"), col("ss_b")).as("jaccard"))
      .where(col("jaccard") >= threshold)
      .groupBy(col("new_doc"))
      .agg(min(struct(col("dup_of"), col("jaccard"))).as("m"))
      .select(col("new_doc"), col("m.dup_of").as("dup_of"),
        col("m.jaccard").as("jaccard"))
  }

  /** EXACT n-gram-Jaccard duplicate pairs — the ground truth the
    * LSH candidate generator approximates. Not all-pairs: docs are
    * exploded to (doc, md5(shingle)) and self-joined on the HASH, so
    * only pairs that actually share a shingle ever meet, and the
    * shuffle key is fixed-width. Any pair at Jaccard >= threshold > 0
    * shares >= 1 shingle, so the join loses nothing.
    *
    * SCALE: cost is Σ per-shingle collision group sizes² — linear for
    * natural text on a bounded sample, quadratic on a full corpus with
    * stop-shingle blowup. This is deliberately the harness's EXACT
    * side: run it on a hash-sampled subset (p59 samples 40 %) to score
    * the LSH banding's recall before trusting it corpus-wide.
    */
  def exactJaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      nGram: Int = 3, threshold: Double = 0.2): DataFrame = {
    val sh = TextOps.shingles(TextOps.tokens(col(textCol)), nGram)
    val shingleSets = df
      .select(col(idCol).as("doc"), array_distinct(sh).as("shingle_set"))
      .where(size(col("shingle_set")) > 0)
    val exploded = shingleSets
      .select(col("doc"), explode(col("shingle_set")).as("s"))
      .select(col("doc"), md5(col("s")).as("h"))
    val inter = exploded.as("a")
      .join(exploded.as("b"),
        col("a.h") === col("b.h") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
      .agg(count(lit(1)).as("__inter"))
    val sizes = shingleSets.select(
      col("doc"), size(col("shingle_set")).cast("long").as("__nsh"))
    inter
      .join(sizes.select(col("doc").as("doc_a"), col("__nsh").as("__na")), "doc_a")
      .join(sizes.select(col("doc").as("doc_b"), col("__nsh").as("__nb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (col("__inter").cast("double") /
          (col("__na") + col("__nb") - col("__inter")).cast("double"))
          .as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** SimHash signatures per document (one codegen'd pass per doc). */
  def simhashSignatures(df: DataFrame, idCol: String, textCol: String,
      bits: Int = 60): DataFrame =
    Par.widen(df.select(col(idCol), col(textCol)))
      .select(col(idCol).as("doc"),
        TextOps.simhash(TextOps.tokens(col(textCol)), bits).as("simhash"))

  /** SimHash near-duplicate pairs: band the 60-bit signature into
    * `chunks` 15-bit chunks; a pair within Hamming distance d collides
    * on >=1 chunk when d < chunks (pigeonhole) — join per chunk, then
    * verify exact Hamming distance via bit_count(xor). */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 8, chunks: Int = 4): DataFrame = {
    val sigs = simhashSignatures(df, idCol, textCol)
    val chunked = sigs.select(col("doc"), col("simhash"),
      posexplode(array((0 until chunks).map(c =>
        shiftright(col("simhash"), c * 15).bitwiseAND(32767)): _*))
        .as(Seq("chunk_id", "chunk_val")))
    val a = chunked.as("a")
    val b = chunked.as("b")
    a.join(b,
      col("a.chunk_id") === col("b.chunk_id") &&
        col("a.chunk_val") === col("b.chunk_val") &&
        col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Frequency-capped SimHash pairs — the [[minhashPairsCapped]]
    * defenses applied to [[simhashPairs]]' chunk join, with an even
    * stronger collapse invariant: Hamming distance is a function of the
    * SIGNATURE alone, so docs sharing a 60-bit simhash are perfectly
    * interchangeable (same distance to everything). Each signature
    * enters the chunk join once (delegate = min doc id), members attach
    * by star pairs at hamming 0, and chunk buckets holding more than
    * `bucketCap` DISTINCT signatures are diverted (a 15-bit chunk value
    * shared by that many different signatures separates nothing).
    * Component-preserving vs the uncapped pairs when no bucket trips. */
  def simhashPairsCapped(
      df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 8, chunks: Int = 4, bucketCap: Int = 1000): DataFrame = {
    val sigs = simhashSignatures(df, idCol, textCol)
    val deleg = sigs.groupBy(col("simhash")).agg(min(col("doc")).as("__d"))
    val star = sigs.join(deleg, "simhash")
      .where(col("doc") =!= col("__d"))
      .select(col("__d").as("doc_a"), col("doc").as("doc_b"),
        lit(0).as("hamming"))
    val dSig = deleg.select(col("__d").as("doc"), col("simhash"))
    val chunked = dSig.select(col("doc"), col("simhash"),
      posexplode(array((0 until chunks).map(c =>
        shiftright(col("simhash"), c * 15).bitwiseAND(32767)): _*))
        .as(Seq("chunk_id", "chunk_val")))
    val sizes = chunked.groupBy(col("chunk_id"), col("chunk_val"))
      .agg(count(lit(1)).as("__n"))
    val kept = chunked.join(
      sizes.where(col("__n") <= bucketCap)
        .select(col("chunk_id"), col("chunk_val")),
      Seq("chunk_id", "chunk_val"))
    val delegPairs = kept.as("a").join(kept.as("b"),
      col("a.chunk_id") === col("b.chunk_id") &&
        col("a.chunk_val") === col("b.chunk_val") &&
        col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
    star.unionAll(delegPairs)
  }

  /** Sorted-neighborhood near-dup candidates — the classic
    * entity-resolution blocking strategy, complementary to band-LSH
    * ([[simhashPairs]]): sort the corpus by SimHash value (near-dups
    * agree on high bits, so they land adjacent) and compare each doc
    * only against its next `window` neighbors in that order, verifying
    * by Hamming distance. Catches pairs whose banding chunk straddles a
    * boundary; misses pairs differing in a high bit — run BOTH
    * strategies and union for recall, as production ER pipelines do.
    *
    * SCALE: the global sort position is computed WITHOUT a global sort.
    * Rows are bucketed deterministically by the top `bucketBits` bits
    * of the signature (hash-uniform, and bucket order IS sig order, so
    * bucket-major + within-bucket rank = the exact global rank); bucket
    * offsets come from a |buckets|-row aggregate (the only unpartitioned
    * window runs over that tiny frame, bounded by 2^bucketBits). Each
    * row then fans out to its next `window` positions and equi-joins
    * back on the dense index — every shuffle carries only
    * (idx, doc_id, sig) fixed-width triples, never text. The largest
    * per-task frame is ONE bucket, ~n/2^bucketBits rows (hash-uniform,
    * so bounded in expectation, not worst-case-free): scale bucketBits
    * with the corpus (bits ≈ log2(n / rowsPerTask)) to keep it flat —
    * the offsets frame it trades against stays <= 2^bucketBits rows.
    * Pairs straddling bucket edges fall
    * out naturally: position i and i+k join regardless of which bucket
    * holds each side. O(n·w) comparisons total, no pair blow-up, no
    * bucket skew. */
  def sortedNeighborPairs(
      df: DataFrame, idCol: String, textCol: String,
      window: Int = 3, maxHamming: Int = 8, bucketBits: Int = 5): DataFrame = {
    val bits = 60
    val sigs = Par.widen(df.select(col(idCol), col(textCol)))
      .select(col(idCol).as("doc_id"),
        TextOps.simhash(TextOps.tokens(col(textCol)), bits = bits).as("sig"))
      .withColumn("bkt", shiftright(col("sig"), bits - bucketBits))
    // bucket sizes -> exclusive prefix-sum offsets: a tiny frame
    // (<= 2^bucketBits rows), so the unpartitioned window is bounded
    val wOff = org.apache.spark.sql.expressions.Window.orderBy("bkt")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = sigs.groupBy(col("bkt")).agg(count(lit(1)).as("__n"))
      .select(col("bkt"), coalesce(sum(col("__n")).over(wOff), lit(0L)).as("__off"))
    // dense global rank in (sig, doc_id) order, computed per bucket
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy("bkt").orderBy("sig", "doc_id")
    val indexed = sigs.join(broadcast(offsets), "bkt")
      .select(col("doc_id"), col("sig"),
        (col("__off") + row_number().over(wRank) - 1).as("idx"))
    // each row probes positions idx+1 .. idx+window; the equi-join on
    // the dense index realizes exactly the global lead() semantics
    val probes = indexed.select(
      col("doc_id").as("a_id"), col("sig").as("a_sig"),
      explode(array((1 to window).map(k => col("idx") + k): _*)).as("idx"))
    probes.join(indexed, "idx")
      .select(
        least(col("a_id"), col("doc_id")).as("doc_a"),
        greatest(col("a_id"), col("doc_id")).as("doc_b"),
        bit_count(col("a_sig").bitwiseXOR(col("sig"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
    // no distinct needed: idx is a bijection over docs, so every
    // (idx, idx+k) candidate — hence every (doc_a, doc_b) — is unique
  }

  /** Near-dup CLUSTER assignment — the step that turns pairwise matches
    * into "keep one canonical doc per duplicate group": connected
    * components over the similarity graph, labeling every doc with the
    * minimum doc id reachable from it (deterministic representative;
    * singletons label themselves).
    *
    * Iterative min-label propagation: each round, every node takes the
    * min of its own label and its neighbors' labels — one equi-join +
    * partial-agg'd min per round, converging in O(component diameter)
    * rounds. Near-dup components are shallow (diameter ≤ a few hops),
    * so 3-5 rounds close real corpora; `maxIter` bounds adversarial
    * chains. Lineage is cut per round (`localCheckpoint`) so the plan
    * stays O(1) deep. At extreme scale swap in [[clustersStar]]
    * (same signature, alternating large-star/small-star contraction,
    * O(log n) rounds with a geometrically shrinking edge set).
    *
    * The fixpoint (min reachable id) is unique, so the result is
    * deterministic regardless of iteration order or partitioning.
    *
    * @param ids   one row per doc: (idCol)
    * @param pairs undirected near-dup pairs: (doc_a, doc_b)
    * @return (doc_id, cluster_id)
    */
  def clusters(
      ids: DataFrame, pairs: DataFrame, maxIter: Int = 20,
      idCol: String = "doc_id"): DataFrame = {
    val spark = ids.sparkSession
    // Iterate ONLY over nodes that appear in the similarity graph: a doc
    // with no near-dup edge is a singleton whose label can never change,
    // so carrying the whole corpus through every join/checkpoint/sum
    // round is pure waste (near-dup graphs are sparse — edge endpoints
    // are a small fraction of the corpus at any scale). Singletons are
    // labeled by one left join at the end.
    // materialize the edge list ONCE at caller parallelism (pair
    // generation is the corpus-scale step); count then reads the cache
    val both = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .localCheckpoint()
    val nEdges = both.count()
    if (nEdges == 0L)
      return ids.select(col(idCol).as("doc_id"), col(idCol).as("cluster_id"))
    // The iteration state is graph-sized, not corpus-sized — run the loop
    // at parallelism proportional to the edge count instead of the
    // session's shuffle.partitions (32 near-empty tasks per stage, with
    // AQE materializing every exchange as its own job, cost more than
    // the rounds' actual work). Scoped to the loop and restored after;
    // the returned plan (corpus-sized label-back join) executes under the
    // caller's session settings.
    val parts = math.max(1L, math.min(2000L, nEdges / 2000000L)).toInt
    val aqeKey = "spark.sql.adaptive.enabled"
    val sufKey = "spark.sql.shuffle.partitions"
    val aqeWas = spark.conf.get(aqeKey)
    val sufWas = spark.conf.get(sufKey)
    spark.conf.set(aqeKey, "false")
    spark.conf.set(sufKey, parts.toString)
    var labels: DataFrame = null
    try {
      val edges = both.repartition(parts, col("dst")).localCheckpoint()
      labels = edges.select(col("src").as("doc_id")).distinct()
        .withColumn("cluster_id", col("doc_id"))
        .localCheckpoint(eager = false)
      // Labels only ever decrease, so sum(cluster_id) strictly decreases
      // until the fixpoint — convergence costs one partial-agg'd sum per
      // round instead of an old-vs-new join.
      var prevSum = labels.agg(sum("cluster_id")).collect().head.getLong(0)
      var converged = false
      var i = 0
      while (!converged && i < maxIter) {
        val viaNeighbors = edges
          .join(labels, edges("dst") === labels("doc_id"))
          .select(col("src").as("doc_id"), col("cluster_id"))
        val propagated = labels.select("doc_id", "cluster_id")
          .union(viaNeighbors)
          .groupBy("doc_id").agg(min("cluster_id").as("cluster_id"))
        // pointer jumping (path halving): label <- label(label). Neighbor
        // propagation alone walks one hop per round — a chain-shaped
        // component of diameter d would need d rounds (and a maxIter cap
        // could stop short of the fixpoint). The jump roughly doubles the
        // reach per round -> O(log d) rounds, guaranteed fixpoint.
        val byId = propagated.select(
          col("doc_id").as("y_id"), col("cluster_id").as("y_cid"))
        labels = propagated
          .join(byId, col("cluster_id") === col("y_id"), "left")
          .select(col("doc_id"),
            coalesce(col("y_cid"), col("cluster_id")).as("cluster_id"))
          .localCheckpoint(eager = false)
        // lazy checkpoint: this sum is the action that materializes the
        // round — one job per round, not a checkpoint job plus a sum job
        val curSum = labels.agg(sum("cluster_id")).collect().head.getLong(0)
        converged = curSum == prevSum
        prevSum = curSum
        i += 1
      }
    } finally {
      spark.conf.set(aqeKey, aqeWas)
      spark.conf.set(sufKey, sufWas)
    }
    // Singletons (no edges) label themselves; graph nodes take the
    // converged component minimum.
    ids.select(col(idCol).as("doc_id"))
      .join(labels.withColumnRenamed("doc_id", "g_id"),
        col("doc_id") === col("g_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
  }

  /** Alternating large-star/small-star connected components — the
    * extreme-scale variant [[clusters]]' scaladoc names (Kiveris,
    * Lattanzi, Mirrokni, Rastogi, Vassilvitskii, "Connected Components
    * in MapReduce and Beyond", SoCC 2014). Same signature and the same
    * deterministic fixpoint (every doc labeled with the min id
    * reachable from it), different iteration geometry:
    *
    *  - LARGE-STAR: every node points its strictly-larger neighbors at
    *    the minimum of its neighborhood (incl. itself);
    *  - SMALL-STAR: every node re-hangs its smaller-or-equal neighbors
    *    (and itself) off that minimum.
    *
    * Each op is one groupBy(min) + equi-join over the CURRENT edge set
    * — which contracts geometrically: alternation converges in
    * O(log n) rounds on adversarial chains (where plain neighbor
    * propagation needs O(diameter)) and the edge set shrinks toward
    * one star per component, so later rounds touch ever less data.
    * Unlike pointer-jumping over a fixed edge list, the working set
    * contracts WITH the graph — at 100 TB that means the heavy rounds
    * are the first two or three, not all O(log d) of them.
    *
    * Convergence is detected from a per-round edge-set signature
    * (count + decimal sums of endpoints and a 64-bit row hash —
    * overflow-free under ANSI); equal signature = identical edge set =
    * fixpoint, costing one bounded aggregate per round like
    * [[clusters]]' label sum.
    */
  def clustersStar(
      ids: DataFrame, pairs: DataFrame, maxIter: Int = 50,
      idCol: String = "doc_id"): DataFrame = {
    val (stars, _) = starContract(pairs, maxIter)
    val labels =
      if (stars == null) null
      else stars.select(col("hi").as("doc_id"), col("lo").as("cluster_id"))
        .union(stars.select(col("lo").as("doc_id"), col("lo").as("cluster_id")))
        .groupBy("doc_id").agg(min("cluster_id").as("cluster_id"))
    val base = ids.select(col(idCol).as("doc_id"))
    if (labels == null)
      base.select(col("doc_id"), col("doc_id").as("cluster_id"))
    else base
      .join(labels.withColumnRenamed("doc_id", "g_id"),
        col("doc_id") === col("g_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
  }

  /** Run the alternation to its fixpoint; returns (star edges, rounds).
    * Package-visible so specs can assert the round count. A null edge
    * frame means the input had no (non-loop) edges. */
  private[pipeline] def starContract(
      pairs: DataFrame, maxIter: Int): (DataFrame, Int) = {
    var e = pairs
      .select(least(col("doc_a"), col("doc_b")).as("lo"),
        greatest(col("doc_a"), col("doc_b")).as("hi"))
      .where(col("lo") =!= col("hi"))
      .distinct()
      .localCheckpoint()
    def signature(d: DataFrame) = {
      val dec = "decimal(38,0)"
      val r = d.agg(count(lit(1)),
        sum(col("lo").cast(dec)), sum(col("hi").cast(dec)),
        sum(xxhash64(col("lo"), col("hi")).cast(dec))).collect().head
      (r.getLong(0), r.get(1), r.get(2), r.get(3))
    }
    var sig = signature(e)
    if (sig._1 == 0L) return (null, 0)
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxIter) {
      e = smallStar(largeStar(e)).localCheckpoint()
      val next = signature(e)
      converged = next == sig
      sig = next
      rounds += 1
    }
    (e, rounds)
  }

  /** large-star(u): for m = min(Γ(u) ∪ {u}), emit (v, m) for every
    * neighbor v > u. One min-aggregate + one equi-join on u. */
  private def largeStar(e: DataFrame): DataFrame = {
    val both = e.select(col("lo").as("u"), col("hi").as("v"))
      .union(e.select(col("hi").as("u"), col("lo").as("v")))
    val mins = both.groupBy("u").agg(min("v").as("mn"))
      .select(col("u"), least(col("u"), col("mn")).as("m"))
    both.join(mins, "u")
      .where(col("v") > col("u"))
      .select(least(col("v"), col("m")).as("lo"),
        greatest(col("v"), col("m")).as("hi"))
      .where(col("lo") =!= col("hi"))
      .distinct()
  }

  /** small-star(u): neighbors ≤ u are exactly the `lo` side of edges
    * oriented (hi=u); for m = their min, re-hang each of them and u
    * itself off m. */
  private def smallStar(e: DataFrame): DataFrame = {
    val mins = e.groupBy("hi").agg(min("lo").as("m"))
    val rehung = e.join(mins, "hi")
      .select(col("lo").as("a"), col("m").as("b"))
      .union(mins.select(col("hi").as("a"), col("m").as("b")))
    rehung
      .select(least(col("a"), col("b")).as("lo"),
        greatest(col("a"), col("b")).as("hi"))
      .where(col("lo") =!= col("hi"))
      .distinct()
  }
}
