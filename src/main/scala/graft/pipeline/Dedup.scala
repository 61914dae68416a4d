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
  def minhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      nGram: Int = 3,
      k: Int = 6,
      bands: Int = 3,
      threshold: Double = 0.2): DataFrame = {
    val words = TextOps.tokens(col(textCol))
    val sh = TextOps.shingles(words, nGram)
    val shingleSets = df.select(
      col(idCol).as("doc"),
      array_distinct(sh).as("shingle_set"))
      .where(size(col("shingle_set")) > 0)
    val buckets = shingleSets
      .withColumn("sig", TextOps.minhashSignature(col("shingle_set"), k))
      .select(col("doc"),
        posexplode(TextOps.bandKeys(col("sig"), bands, k / bands))
          .as(Seq("band", "bkey")))
    val a = buckets.as("a")
    val b = buckets.as("b")
    val candidates = a.join(b,
      col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
        col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
      .distinct()
    val sa = shingleSets.select(
      col("doc").as("doc_a"), col("shingle_set").as("ss_a"))
    val sb = shingleSets.select(
      col("doc").as("doc_b"), col("shingle_set").as("ss_b"))
    candidates
      .join(sa, "doc_a").join(sb, "doc_b")
      .select(col("doc_a"), col("doc_b"),
        TextOps.jaccard(col("ss_a"), col("ss_b")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** SimHash signatures per document (one codegen'd pass per doc). */
  def simhashSignatures(df: DataFrame, idCol: String, textCol: String,
      bits: Int = 60): DataFrame =
    df.select(col(idCol).as("doc"),
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
}
