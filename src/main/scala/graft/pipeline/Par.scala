package graft.pipeline

import org.apache.spark.sql.DataFrame

/** Parallelism floor for compute-dense stages.
  *
  * Parquet splits are sized by BYTES (`spark.sql.files.maxPartitionBytes`),
  * but codec/shingle/vector-scoring stages cost milliseconds PER ROW — a
  * compact compressed table (13 MB of embeddings = 50k vectors at sf1)
  * lands in ONE split and serializes the expensive stage on one task.
  * Measured before this guard: the sf1 bench sat >20 min in p14's
  * single-task ImageIO loop, and p28's 225M-pair scoring ran at 2 of 32
  * cores. At real cluster scale inputs span many splits and [[widen]] is
  * a pass-through; it only pays (one round-robin shuffle of the
  * pre-compute rows — far cheaper to move once than to process serially)
  * when byte-sized splitting under-parallelizes a row-cost-heavy stage.
  */
object Par {
  def widen(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }

  /** Shuffle-partition count scaled to a stage's INPUT bytes
    * (VERDICT r14 task 5): a join that carries wide payload columns
    * (shingle sets, vectors) through the session's FIXED
    * `spark.sql.shuffle.partitions` spills once the input outgrows it —
    * measured on the uncapped MinHash audit twins at sf30, where the
    * shingle-verify join went superlinear (6.65× wall on 3× data) purely
    * from 32 oversized shuffle partitions, while the algorithm itself is
    * linear. AQE can only coalesce or split-for-skew within the initial
    * count; it never raises it, so the INITIAL count must scale.
    *
    * Returns `max(session shuffle partitions, inputBytes / target)`,
    * from the optimizer's size estimate of `df`'s plan (column-pruned
    * scan size — proportional to SF, available without running a job),
    * capped at 32k partitions. At small SF this is exactly the session
    * value: plans are unchanged below the spill regime. Callers hash
    * `.repartition(parts, keys)` the wide side(s); EnsureRequirements
    * then shuffles the other join side to match instead of re-shuffling
    * the wide one down to the session count. */
  def scaledShuffleParts(df: DataFrame,
      targetBytesPerPartition: Long = 8L << 20): Int = {
    val sess = df.sparkSession.sessionState.conf.numShufflePartitions
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val want = (bytes / targetBytesPerPartition).min(BigInt(32768)).toInt + 1
    math.max(sess, want)
  }
}
