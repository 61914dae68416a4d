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
    * SCALE: the self-join shuffles (band_id, band_key, doc_id, shingles);
    * shingles ride along only for the verify step on *candidates* —
    * with sane banding the candidate set is ~linear in true duplicates.
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
    val sig = df.select(
      col(idCol).as("doc"),
      array_distinct(sh).as("shingle_set"))
      .where(size(col("shingle_set")) > 0)
      .withColumn("sig", TextOps.minhashSignature(col("shingle_set"), k))
      .withColumn("bandkeys", TextOps.bandKeys(col("sig"), bands, k / bands))
    val buckets = sig.select(
      col("doc"), col("shingle_set"),
      posexplode(col("bandkeys")).as(Seq("band", "bkey")))
    val a = buckets.as("a")
    val b = buckets.as("b")
    a.join(b,
      col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
        col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"),
        TextOps.jaccard(col("a.shingle_set"), col("b.shingle_set")).as("jaccard"))
      .distinct()
      .where(col("jaccard") >= threshold)
  }

  /** SimHash signatures per document (word hashes materialized once). */
  def simhashSignatures(df: DataFrame, idCol: String, textCol: String,
      bits: Int = 60): DataFrame =
    df.select(col(idCol).as("doc"),
      transform(TextOps.tokens(col(textCol)), TextOps.wordHash(_)).as("hs"))
      .select(col("doc"), TextOps.simhashFromHashes(col("hs"), bits).as("simhash"))

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
