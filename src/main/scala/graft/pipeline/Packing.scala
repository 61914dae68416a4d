package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.DistributedRank

/** Token-budget shard packing: assign documents (in deterministic id
  * order) to contiguous training shards of ~`budget` tokens each —
  * doc i lands in shard `exclusivePrefixTokens(i) div budget`, at
  * offset `exclusivePrefixTokens(i) mod budget` within it. The standard
  * pre-tokenization sharding step of an LLM data pipeline (docs are
  * concatenated shard-by-shard downstream; a doc may straddle a shard
  * boundary, as in fixed-length sequence packing).
  *
  * SCALE: a global running sum is the textbook single-partition-window
  * trap. The distributed two-phase scan lives in
  * [[graft.operators.DistributedRank]] (shared with the global-rank
  * catalog queries); only (id, tokens) — 16 bytes/row, NOT the text —
  * enters the scan. All arithmetic is exact integer ops (div/mod, no
  * doubles), so the assignment is bit-stable across partitionings and
  * engines.
  */
object Packing {

  /** @param df       input with `idCol` (orderable, unique) and `tokenCol`
    * @param budget   tokens per shard (> 0)
    * @param numParts range partitions for the scan; 0 = session default
    * @return (doc_id, tokens, shard_id, shard_offset) one row per input
    */
  def packShards(
      df: DataFrame, idCol: String, tokenCol: String, budget: Long,
      numParts: Int = 0): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val slim = df.select(
      col(idCol).as("doc_id"), col(tokenCol).cast("long").as("tokens"))
    DistributedRank
      .withExclusivePrefixSum(slim, col("tokens"), "_prefix", numParts)(
        col("doc_id"))
      .df
      .select(col("doc_id"), col("tokens"),
        expr(s"_prefix div ${budget}L").as("shard_id"),
        (col("_prefix") % budget).as("shard_offset"))
  }

  /** Materialize the packed shards: join the assignment back to the
    * full rows and write ONE parquet file per shard under
    * `out/shard_id=N/`, plus a `_manifest` parquet (shard_id, n_docs,
    * n_tokens, first_doc, last_doc) — the unit a training job consumes
    * (open shard k, read docs in doc_id order, concatenate).
    *
    * SCALE: the assignment scan carries only (id, tokens); text joins
    * in by id AFTER packing (one hash shuffle of the payload, its only
    * move). `repartition(shard_id)` gives each shard exactly one
    * writer task -> one file, and `partitionBy` makes shard reads
    * partition-pruned. One file per ~budget tokens is the intended
    * file size knob; shards-per-job stays bounded by data/budget, so
    * the 200-ish-MB-file discipline holds at any corpus size.
    */
  def writeShards(
      df: DataFrame, idCol: String, tokenCol: String, budget: Long,
      out: String, numParts: Int = 0): DataFrame = {
    // pin the assignment (16 bytes/row): the shard write AND the
    // manifest both consume it, and without this the second action
    // would re-run the whole two-phase prefix scan from scratch
    val assigned = packShards(df, idCol, tokenCol, budget, numParts)
      .localCheckpoint()
    val rows = df.withColumnRenamed(idCol, "doc_id")
      .join(assigned.select(col("doc_id"), col("shard_id"), col("shard_offset")),
        Seq("doc_id"))
    // sort key must LEAD with the partition column: the parquet writer
    // requires ordering on partitionBy columns and would otherwise
    // plan its own shard_id sort, leaving in-file doc order to sort
    // stability instead of this explicit spec
    rows.repartition(col("shard_id"))
      .sortWithinPartitions(col("shard_id"), col("doc_id"))
      .write.mode("overwrite").partitionBy("shard_id").parquet(out)
    val manifest = assigned.groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tokens")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy(col("shard_id"))
    manifest.coalesce(1).write.mode("overwrite").parquet(s"$out/_manifest")
    manifest
  }
}
