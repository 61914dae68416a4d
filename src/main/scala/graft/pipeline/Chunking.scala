package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Context-window chunking — splitting documents into overlapping
  * token-budget windows, the step between curation and shard packing in
  * a training pipeline (every example must fit the model's context).
  *
  * Shape at 100 TB: chunk planning is pure per-row integer arithmetic +
  * a generator (`explode(sequence(...))`) — a map-only stage, no
  * shuffle, no state. A document expands to its chunk rows inside one
  * task; nothing driver-side. The chunk fingerprint (md5 of the joined
  * token slice) is what leaves the stage for downstream dedup — 16
  * bytes per chunk regardless of window size, the same ship-the-hash
  * discipline as [[Dedup]].
  *
  * Window arithmetic (win tokens, stride = win − overlap):
  * n_chunks = 1 + ceil(max(ntok − win, 0) / stride), chunk k covers
  * token indices [k·stride, min(k·stride + win, ntok)). The last chunk
  * may be short; every token is covered; consecutive chunks overlap by
  * win − stride. All integer ops — exactly replayable in DuckDB.
  */
object Chunking {

  val Win = 120
  val Stride = 96

  /** Chunk plan per document: (doc_id, source, chunk_id, tok_start,
    * tok_end, n_tok, chunk_md5), one row per chunk. With `keepSlice`
    * the chunk's token array rides along as `chunk_toks` for consumers
    * that tokenize or fingerprint at chunk grain (still map-only — the
    * slice exists only inside the generator stage unless the consumer
    * shuffles it). */
  def plan(docs: DataFrame, win: Int = Win, stride: Int = Stride,
      keepSlice: Boolean = false): DataFrame = {
    val toks: Column = TextOps.tokens(col("text"))
    docs
      .select(col("doc_id"), col("source"), toks.as("toks"),
        size(toks).as("ntok"))
      .withColumn("n_chunks",
        lit(1) + expr(s"(GREATEST(ntok - $win, 0) + ${stride - 1}) DIV $stride"))
      .select(col("doc_id"), col("source"), col("toks"), col("ntok"),
        explode(sequence(lit(0), col("n_chunks") - 1)).as("chunk_id"))
      .withColumn("tok_start", col("chunk_id") * stride)
      .withColumn("tok_end", least(col("tok_start") + win, col("ntok")))
      .withColumn("n_tok", col("tok_end") - col("tok_start"))
      .withColumn("chunk_toks",
        slice(col("toks"), col("tok_start") + 1, col("n_tok")))
      .withColumn("chunk_md5", md5(concat_ws(" ", col("chunk_toks"))))
      .select(Seq(col("doc_id"),
        col("source"),
        col("chunk_id").cast("long").as("chunk_id"),
        col("tok_start").cast("long").as("tok_start"),
        col("tok_end").cast("long").as("tok_end"),
        col("n_tok").cast("long").as("n_tok"),
        col("chunk_md5")) ++
        (if (keepSlice) Seq(col("chunk_toks")) else Nil): _*)
  }

  /** Chunk-level dedup audit per source: how many tokens does exact
    * chunk dedup save? Chunks with the same fingerprint inside a source
    * keep one copy; the rest are `tok_saved`. Shuffles only (source,
    * md5, n_tok) triples — never chunk text. */
  def dedupAudit(docs: DataFrame, win: Int = Win, stride: Int = Stride)
      : DataFrame = {
    val chunks = plan(docs, win, stride)
    chunks
      // same fingerprint ⇒ same token slice ⇒ same n_tok, so per-group
      // n_tok is constant; min() just names that constant
      .groupBy(col("source"), col("chunk_md5"))
      .agg(count(lit(1)).as("copies"), min(col("n_tok")).as("n_tok"))
      .groupBy(col("source"))
      .agg(sum(col("copies")).as("n_chunks"),
        count(lit(1)).as("n_distinct"),
        sum(col("copies") * col("n_tok")).as("tok_total"),
        sum((col("copies") - 1) * col("n_tok")).as("tok_saved"))
      .orderBy(col("source"))
  }

  /** Exact BPE token count PER CHUNK through the vocabulary cache —
    * the chunk-grain twin of [[Vocab.bpeTokensCached]], and the plan
    * that wins at 100 TB: BPE merges never cross the word-boundary
    * tokenizer, so a chunk's token count is the SUM of its words'
    * counts, and each distinct word type needs encoding exactly ONCE
    * (Heaps'-law vocab ≪ corpus occurrences). Re-encoding every
    * overlapping window slice — the naive composition of chunking ×
    * encoding — re-runs the merge loop win/stride times per word AND
    * pays occurrences instead of types: measured 83 s → the cached
    * plan's ~10 s on the sf10 catalog entry (p76).
    *
    * Shape: posexplode words (map-only), broadcast-join the distinct
    * (word → count) table back, expand each word to the chunks whose
    * window covers it (≤ ceil(win/stride) chunk ids, a bounded
    * generator), partial-agg the per-chunk sums map-side. Only
    * (doc_id, chunk_id, partial sum) rows shuffle — never words.
    *
    * @return (doc_id, chunk_id, bpe_tokens), one row per chunk —
    *         aligned with [[plan]]'s chunk ids. */
  def bpeCountsCached(
      docs: DataFrame, win: Int = Win, stride: Int = Stride): DataFrame = {
    // the chunk-id generator below assumes overlapping-or-adjacent
    // windows: with stride > win the lower bound can EXCEED the upper
    // bound, and Spark's sequence(start, stop) silently produces a
    // DESCENDING range instead of an empty one — attributing a word's
    // count to chunks whose window does not contain it
    require(win >= stride,
      s"bpeCountsCached needs win >= stride (got win=$win stride=$stride)")
    val toks: Column = TextOps.tokens(col("text"))
    val words = docs
      .select(col("doc_id"), toks.as("toks"), size(toks).as("ntok"))
      .withColumn("nch",
        lit(1) + expr(s"(GREATEST(ntok - $win, 0) + ${stride - 1}) DIV $stride"))
      .select(col("doc_id"), col("nch"),
        posexplode(col("toks")).as(Seq("wi", "word")))
    val types = words.select("word").distinct()
      .select(col("word"),
        graft.functions.Text.bpeCount(array(col("word"))).as("n_tok"))
    words.join(broadcast(types), "word")
      // word wi belongs to chunk k iff k*stride <= wi < k*stride + win:
      // k from ceil((wi-win+1)/stride) to wi DIV stride, clamped to the
      // doc's chunk range. The +stride rewrite keeps the ceil correct
      // under SQL's truncate-toward-zero DIV for small wi (numerator
      // stays > -stride, so trunc == the clamped floor).
      .withColumn("chunk_id", explode(sequence(
        greatest(lit(0L), expr(s"CAST((wi - $win + $stride) DIV $stride AS BIGINT)")),
        least(expr(s"CAST(wi DIV $stride AS BIGINT)"),
          col("nch").cast("long") - 1L))))
      .groupBy(col("doc_id"), col("chunk_id"))
      .agg(sum(col("n_tok")).as("bpe_tokens"))
  }
}
