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
}
