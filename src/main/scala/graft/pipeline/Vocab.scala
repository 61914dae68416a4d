package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus vocabulary statistics — term and document frequencies, and
  * per-document distinctive terms. The building blocks behind tokenizer
  * training, stopword derivation, and tf-idf-style feature selection in
  * a training-data pipeline.
  *
  * Scale shape: tokens explode map-side and immediately partial-
  * aggregate, so the shuffle carries (token, partial counts) — bounded
  * by vocabulary size per partition, NOT corpus size. Document text
  * never shuffles. Per-doc term ranking windows partition by doc id.
  */
object Vocab {

  /** Corpus-wide (token, tf, df): total occurrences and number of
    * distinct documents containing the token. */
  def termStats(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("__doc"),
        explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("tf"),
        countDistinct(col("__doc")).as("df"))

  /** Top-k corpus vocabulary by total frequency (ties broken by token
    * text for determinism). */
  def topVocab(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    termStats(docs, idCol, textCol)
      .orderBy(col("tf").desc, col("token"))
      .limit(k)

  /** Per-document top-k distinctive terms: rank by within-doc frequency
    * descending, then corpus document-frequency ascending (rarer-in-
    * corpus wins the tie — the rank-based analog of tf-idf without
    * float logarithms), then token text.
    *
    * The corpus df table is vocabulary-sized (≪ corpus), so Catalyst
    * broadcast-joins it back onto the per-doc term counts; the ranking
    * window partitions by document. */
  def topTermsPerDoc(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val perDoc = docs.select(col(idCol).as("doc"),
        explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy("doc", "token")
      .agg(count(lit(1)).as("tf"))
    val df = termStats(docs, idCol, textCol).select(col("token"), col("df"))
    val w = Window.partitionBy("doc")
      .orderBy(col("tf").desc, col("df").asc, col("token"))
    perDoc.join(broadcast(df), "token")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc"), col("rank"), col("token"), col("tf"), col("df"))
  }
}
