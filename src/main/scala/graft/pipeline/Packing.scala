package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget shard packing: assign documents (in deterministic id
  * order) to contiguous training shards of ~`budget` tokens each —
  * doc i lands in shard `exclusivePrefixTokens(i) div budget`, at
  * offset `exclusivePrefixTokens(i) mod budget` within it. The standard
  * pre-tokenization sharding step of an LLM data pipeline (docs are
  * concatenated shard-by-shard downstream; a doc may straddle a shard
  * boundary, as in fixed-length sequence packing).
  *
  * SCALE: a global running sum is the textbook single-partition-window
  * trap (`Window.orderBy(id)` with no partitionBy serializes the whole
  * corpus through one task). This is instead a distributed two-phase
  * scan:
  *   1. range-repartition (id, tokens) — 16 bytes/row, NOT the text —
  *      and pin the partitioning (`localCheckpoint`) so both phases see
  *      identical placement;
  *   2. per-partition token sums -> driver (bounded: one row per
  *      partition) -> exclusive per-partition offsets broadcast back;
  *   3. within-partition running sum (parallel window, partitioned by
  *      partition id) + the partition's offset = the global prefix.
  * All arithmetic is exact integer ops (div/mod, no doubles), so the
  * assignment is bit-stable across partitionings and engines.
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
    val spark = df.sparkSession
    import spark.implicits._
    val nParts =
      if (numParts > 0) numParts
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = df
      .select(col(idCol).as("doc_id"), col(tokenCol).cast("long").as("tokens"))
      .repartitionByRange(nParts, col("doc_id"))
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    // phase 2: per-partition sums, exclusive-scanned on the driver
    val sums = ranged.groupBy("_pid").agg(sum("tokens").as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until nParts)
      .scanLeft(0L)((acc, p) => acc + sums.getOrElse(p, 0L))
    val offDf = broadcast(
      (0 until nParts).map(p => (p, offsets(p))).toDF("_pid", "_off"))
    // phase 3: parallel within-partition running sum + broadcast offset
    val w = Window.partitionBy(col("_pid")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ranged.join(offDf, "_pid")
      .withColumn("_prefix",
        coalesce(sum(col("tokens")).over(w), lit(0L)) + col("_off"))
      .select(col("doc_id"), col("tokens"),
        expr(s"_prefix div ${budget}L").as("shard_id"),
        (col("_prefix") % budget).as("shard_offset"))
  }
}
