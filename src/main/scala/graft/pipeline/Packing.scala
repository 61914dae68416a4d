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
}
