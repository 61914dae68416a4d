package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for large-scale training-data pipelines: tokenizing,
  * shingling, MinHash signatures, SimHash, fingerprints.
  *
  * Design constraints (100 TB discipline):
  *  - everything is a codegen'd Column expression (built-in functions +
  *    higher-order lambdas) — no UDFs, no driver round-trips;
  *  - the only cross-row operations are groupBy/join on FIXED-WIDTH hash
  *    keys (md5 hex / 64-bit ints), never on raw text, so shuffles carry
  *    hashes instead of documents;
  *  - md5 is the deterministic hash everywhere: portable across engines
  *    (the DuckDB oracle reproduces every signature bit-for-bit).
  */
object TextOps {

  /** Whitespace tokens — split(text, " ") semantics (every token kept,
    * empties included), via the codegen'd byte-scan kernel
    * (graft.functions.TokensExpr): the built-in StringSplit routes
    * through String.split — a full UTF-16 decode per document plus a
    * String allocation and UTF-8 re-encode per token — on every corpus
    * pass of every text operator. Bit-identical for valid UTF-8 input
    * (pinned by TokExprsSpec against the built-in). */
  def tokens(text: Column): Column = graft.functions.Tok.tokensCol(text)

  /** Word n-gram shingles (ordered, with duplicates). Documents shorter
    * than n words yield an empty array.
    *
    * Codegen'd single-pass expression (graft.functions.ShinglesExpr);
    * the equivalent HOF formulation — `transform(sequence(0, size-n),
    * i => concat_ws(" ", element_at(words, i+1)...))` — is interpreted
    * (CodegenFallback) and re-evaluates `words` per element. */
  def shingles(words: Column, n: Int): Column =
    graft.functions.Hashing.shinglesCol(words, n)

  /** One MinHash value: min over shingles of md5(salt:shingle).
    * A distinct salt per permutation simulates k independent hash
    * functions; min of md5 hex strings = min-wise order statistic. */
  def minhash(shingleSet: Column, perm: Int): Column =
    array_min(transform(shingleSet, s => md5(concat(lit(s"mh$perm:"), s))))

  /** k-permutation MinHash signature as an array column.
    *
    * Codegen'd one-pass expression (graft.functions.MinHashSigExpr) —
    * bit-identical to `array(minhash(ss,0), ..., minhash(ss,k-1))` but
    * with a reused digest and byte-wise min; the hot path of MinHash
    * dedup at scale. */
  def minhashSignature(shingleSet: Column, k: Int): Column =
    graft.functions.Hashing.minhashSigCol(shingleSet, k)

  /** LSH band keys from a signature: bands of r rows hashed together.
    * Two docs collide in a band iff that band of their signatures is
    * identical; P(collide) = 1-(1-J^r)^b. */
  def bandKeys(signature: Column, bands: Int, r: Int): Column =
    array((0 until bands).map { b =>
      md5(concat_ws("|",
        (0 until r).map(i => element_at(signature, b * r + i + 1)): _*))
    }: _*)

  /** 60-bit word hash from md5 (portable: DuckDB reproduces it via
    * CAST('0x'||substr(md5(w),1,15) AS BIGINT)). */
  def wordHash(word: Column): Column =
    conv(substring(md5(word), 1, 15), 16, 10).cast("long")

  /** 60-bit SimHash over the token multiset: per-bit majority vote of
    * word hashes. bits = number of signature bits (max 60).
    *
    * Codegen'd one-pass expression (graft.functions.SimHashExpr) —
    * bit-identical to the HOF formulation in simhashFromHashes. */
  def simhash(words: Column, bits: Int = 60): Column =
    graft.functions.Hashing.simhashCol(words, bits)

  /** SimHash from a precomputed word-hash array column — materialize the
    * hashes once (withColumn) before calling: the per-bit vote re-reads
    * the array `bits` times, and hashing words once per bit would be a
    * 60x waste. */
  def simhashFromHashes(hashes: Column, bits: Int = 60): Column =
    (0 until bits).map { b =>
      when(aggregate(hashes, lit(0L), (acc, h) =>
        acc + when(shiftright(h, b).bitwiseAND(1) === 1, 1L)
          .otherwise(-1L)) > 0, shiftleft(lit(1L), b)).otherwise(0L)
    }.reduce(_ + _)

  /** Jaccard similarity of two array columns (set semantics). */
  def jaccard(a: Column, b: Column): Column = {
    val da = array_distinct(a)
    val db = array_distinct(b)
    size(array_intersect(da, db)).cast("double") /
      size(array_union(da, db)).cast("double")
  }

  /** Email pattern shared by scrubber and detector — kept to syntax
    * valid in both Java regex and RE2 (no backrefs, no lookarounds) so
    * the DuckDB oracle runs the identical pattern. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** PII scrubbing: masks email addresses then digit runs (phone/SSN/
    * account-number shapes) with typed placeholders. Pure codegen'd
    * `regexp_replace` chain — the pattern compiles once per task, rows
    * never leave the projection, nothing shuffles. */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, lit(EmailPattern), lit("<EMAIL>")),
      lit("[0-9]+"), lit("<NUM>"))

  /** Canonical text normalization — the first step of every corpus
    * pipeline, and the precondition for exact dedup actually hitting
    * (case/punctuation variants of the same content must collapse to
    * one hash). lowercase -> non-alphanumerics to spaces -> space runs
    * collapsed -> trimmed. The character classes are valid in both
    * Java regex and RE2 (no backrefs/lookarounds), so the DuckDB
    * oracle runs the identical patterns. Pure codegen'd projection:
    * patterns compile once per task, nothing shuffles. */
  def normalize(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), lit("[^a-z0-9 ]+"), lit(" ")),
      lit(" +"), lit(" ")))

  /** Count of digit characters (pre-scrub audit metric). */
  def digitCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, lit("[0-9]"), lit(""))))
      .cast("long")

  /** Rolling-hash document fingerprint: min md5 over word 5-gram
    * shingles — a winnowing-style content fingerprint stable under
    * small edits at the margins. Codegen'd one-pass expression
    * (graft.functions.FingerprintExpr). */
  def fingerprint(words: Column, n: Int = 5): Column =
    graft.functions.Hashing.fingerprintCol(words, n)
}
