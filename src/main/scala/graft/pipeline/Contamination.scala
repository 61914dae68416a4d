package graft.pipeline

import org.apache.spark.sql.DataFrame
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
    def hashes(d: DataFrame) = d
      .select(col(idCol).as("doc_id"),
        explode(array_distinct(
          TextOps.shingles(TextOps.tokens(col(textCol)), nGram))).as("s"))
      .select(col("doc_id"), md5(col("s")).as("h"))
    val tr = hashes(train)
    val te = hashes(heldOut).select(col("h")).distinct()
    tr.join(te, "h")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
  }
}
