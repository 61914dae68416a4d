package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ordering primitives: row numbers and running sums
  * over a TOTAL order, without the single-partition-window trap.
  *
  * `Window.orderBy(keys)` with no `partitionBy` is the textbook
  * scale-killer: Catalyst plans `Exchange SinglePartition` and the whole
  * frame funnels through ONE task. Correct at sf0.1, dead at 100 TB.
  * This helper replaces it with a two-phase distributed scan (the shape
  * the reference delegates to PostgreSQL's serial executor — here it has
  * to be parallel):
  *
  *   1. range-repartition on the sort keys (equal keys co-locate, ranges
  *      are totally ordered across partitions) and pin the placement
  *      with `localCheckpoint` so both phases see identical rows;
  *   2. per-partition aggregates -> driver (bounded: ONE row per
  *      partition, a few KB at any scale) -> exclusive prefix offsets
  *      broadcast back;
  *   3. within-partition window (parallel: partitioned by partition id)
  *      + the partition's broadcast offset = the global value.
  *
  * All arithmetic is exact integer ops, so results are bit-stable across
  * partitionings and engines (the DuckDB oracle agrees row-for-row).
  *
  * DISCIPLINE: project the input down to the sort keys + carried columns
  * BEFORE calling — the checkpoint materializes every column you pass
  * (the callers here carry fixed-width ids, never document text).
  *
  * FAILURE SEMANTICS AT SCALE: by default `localCheckpoint` pins the
  * phase-1 placement in EXECUTOR-LOCAL blocks with truncated lineage —
  * the blocks are deliberately NOT recomputable. Losing an executor
  * between the pin and the last consumption FAILS the query with a
  * checkpoint-block-not-found error; the caller re-runs the scan from
  * the source. Fail-loud is the chosen direction: a silent recompute
  * could assign ties to different partitions than the offsets phase 2
  * already collected, returning WRONG ranks with no error.
  *
  * DURABLE OPTION (VERDICT r13 task 5): a cluster job that cannot
  * afford the re-run (hours-long scans on preemptible executors) sets
  * the runtime conf `graft.rank.checkpointDir` to a durable path (HDFS/
  * object store); every [[pin]] then uses a reliable `df.checkpoint()`
  * instead — identical semantics and placement, re-READ from storage on
  * block loss, at ~one extra write of the projected columns. Unset
  * (default, and in this single-JVM harness) keeps the fail-loud local
  * pin. DistributedRankSpec pins BOTH contracts.
  */
object DistributedRank {

  /** The conf key that switches every placement pin from fail-loud
    * `localCheckpoint` to a durable `checkpoint()` rooted at its
    * value. */
  val ReliableDirConf = "graft.rank.checkpointDir"

  /** Pin `df`'s rows into storage with ONE eager evaluation of its
    * plan, placement frozen: fail-loud executor-local blocks by
    * default, a durable reliable checkpoint when [[ReliableDirConf]]
    * is set (see object scaladoc). Shared by the rank scan and the
    * pin-then-delete-scaffolding callers in the query catalog. */
  def pin(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(ReliableDirConf).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = spark.sparkContext
        sc.getCheckpointDir match {
          case None =>
            sc.setCheckpointDir(dir)
            // reliable checkpoints are NOT reclaimed by default
            // (spark.cleaner.referenceTracking.cleanCheckpoints=false):
            // every pin leaves a durable copy under the dir for the
            // life of the job. A long-running job should either enable
            // that cleaner conf or point ReliableDirConf at a
            // TTL-managed path; say so once rather than leak silently
            // (ADVICE r14).
            if (!sc.getConf.getBoolean(
                "spark.cleaner.referenceTracking.cleanCheckpoints", false))
              System.err.println(
                s"[graft] DistributedRank: reliable pins under $dir are " +
                  "kept for the job's lifetime (set spark.cleaner." +
                  "referenceTracking.cleanCheckpoints=true or use a " +
                  "TTL-managed dir for long-running jobs)")
          case Some(existing) =>
            // setCheckpointDir appends a per-context UUID segment, so
            // compare by prefix after stripping any scheme — if the
            // context's dir was pinned elsewhere to a DIFFERENT root,
            // the conf's value is being ignored: warn, don't silently
            // checkpoint somewhere the operator didn't promise
            // (ADVICE r14)
            val want = dir.stripSuffix("/")
            val got = existing.replaceFirst("^[a-zA-Z][a-zA-Z0-9+.-]*:(//)?", "")
            if (!got.startsWith(want.replaceFirst(
                "^[a-zA-Z][a-zA-Z0-9+.-]*:(//)?", "")))
              System.err.println(
                s"[graft] DistributedRank: $ReliableDirConf=$dir ignored " +
                  s"— the SparkContext checkpoint dir is already $existing")
        }
        df.checkpoint()
      case None => df.localCheckpoint(true)
    }
  }

  /** Result of a distributed scan: the annotated frame plus the global
    * total (row count for ranks, value sum for prefix sums) — already
    * known driver-side from phase 2, no extra job to count.
    */
  final case class Scanned(df: DataFrame, total: Long)

  /** Global 1-based `row_number() over (order by sort*)` as column
    * `rnCol`, computed distributed. Ties across partitions are safe:
    * the range partitioner co-locates equal keys, so within-partition
    * numbering + offset reproduces the serial numbering exactly (callers
    * still want a deterministic tiebreak key for oracle stability, as
    * everywhere else in the catalog).
    */
  def withRowNumber(
      df: DataFrame, rnCol: String, numParts: Int = 0)(
      sort: Column*): Scanned = {
    val s = scan(df, lit(1L), numParts, sort)
    Scanned(
      s.df.withColumn(rnCol, col(PrefixCol) + lit(1L)).drop(PrefixCol),
      s.total)
  }

  /** Global EXCLUSIVE running sum of `value` (cast to long) in sort
    * order, as column `prefixCol`; `total` is the grand sum. This is the
    * shard-packing primitive: doc i's prefix div budget = its shard.
    */
  def withExclusivePrefixSum(
      df: DataFrame, value: Column, prefixCol: String, numParts: Int = 0)(
      sort: Column*): Scanned = {
    val s = scan(df, value.cast("long"), numParts, sort)
    Scanned(s.df.withColumnRenamed(PrefixCol, prefixCol), s.total)
  }

  private val PrefixCol = "__dr_prefix"

  private def scan(
      df: DataFrame, value: Column, numParts: Int,
      sort: Seq[Column]): Scanned = {
    require(sort.nonEmpty, "at least one sort key required")
    val spark = df.sparkSession
    import spark.implicits._
    val nParts =
      if (numParts > 0) numParts
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    // phase 1: range shuffle + pinned placement (both later phases must
    // observe the same row->partition assignment)
    val ranged = pin(df
      .withColumn("__dr_v", value)
      .repartitionByRange(nParts, sort: _*)
      .withColumn("__dr_pid", spark_partition_id()))
    // phase 2: bounded driver round-trip — one (pid, sum) row per
    // partition, scanLeft'd into exclusive offsets
    val perPart = ranged.groupBy("__dr_pid").agg(sum("__dr_v").as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until nParts)
      .scanLeft(0L)((acc, p) => acc + perPart.getOrElse(p, 0L))
    val offDf = broadcast(
      (0 until nParts).map(p => (p, offsets(p))).toDF("__dr_pid", "__dr_off"))
    // phase 3: parallel within-partition scan + broadcast offset
    val w = Window.partitionBy(col("__dr_pid")).orderBy(sort: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val out = ranged.join(offDf, "__dr_pid")
      .withColumn(PrefixCol,
        coalesce(sum(col("__dr_v")).over(w), lit(0L)) + col("__dr_off"))
      .drop("__dr_pid", "__dr_off", "__dr_v")
    Scanned(out, offsets(nParts))
  }

  /** `ntile(buckets)` derived arithmetically from a global row number:
    * with n rows and k buckets, the first n%k buckets hold ceil(n/k)
    * rows and the rest floor(n/k) — identical to the SQL-standard NTILE
    * over the same total order, but needing only the distributed rank
    * (no second window). Exact integer arithmetic throughout.
    */
  def ntileOfRank(rn: Column, n: Long, buckets: Int): Column = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val base = n / buckets
    val rem = n % buckets
    if (base == 0L) rn.cast("int") // fewer rows than buckets: rank IS the bucket
    else {
      val cutoff = rem * (base + 1)
      when(rn <= cutoff, ((rn - 1) / (base + 1) + 1))
        .otherwise(lit(rem) + (rn - 1 - cutoff) / base + 1)
        .cast("int")
    }
  }

  /** `cume_dist()` for a total order with no peer rows (every catalog
    * use sorts with a unique tiebreak): rank / n as an exact double
    * division — bit-identical to the SQL window on both engines.
    */
  def cumeDistOfRank(rn: Column, n: Long): Column =
    rn.cast("double") / lit(n.toDouble)
}
