package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.cdc.ChangeApply

/** Delta-log (LSM-style) document store: O(batch) writes, reads merge
  * base ⊕ deltas, compaction folds the log back into the base.
  *
  * The three state stores cover the CDC write-amplification spectrum
  * (all share the rev-guarded merge semantics and batch-replay NOOP):
  *  - [[MergeSink]]: full snapshot per batch — best for bulk loads;
  *  - [[BucketedMergeSink]]: rewrite touched hash buckets — best when
  *    batches have key locality;
  *  - this store: append the batch's effective changes as a delta file
  *    (merge-on-read, like log-structured merge tables) — best for
  *    high-rate small batches over large state, the regime where the
  *    others are measured at 16-43 docs/s.
  *
  * Layout:
  *   root/_LOG                "lastBatchId baseVersion d<id> d<id> ..."
  *   root/base/v=N/           compacted snapshot (absent until first compact)
  *   root/delta/d=K/          per-batch deltas (K = batchId), rows carry
  *                            `deleted` tombstones
  *
  * Read = latest row per id across base (epoch -1) and deltas (epoch =
  * batchId), tombstones dropped — one max_by aggregation, partial
  * (map-side) combined. Compaction runs automatically when the log
  * exceeds `compactEvery` deltas.
  */
object DeltaLogMergeSink {

  final case class Log(batchId: Long, baseVersion: Long, deltas: Vector[Long])

  private val deltaSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "id STRING, rev STRING, doc STRING, deleted BOOLEAN, seq BIGINT")
  private val stateSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "id STRING, rev STRING, doc STRING")

  def readLog(root: String): Option[Log] = {
    val p = Paths.get(root, "_LOG")
    if (!Files.exists(p)) None
    else {
      val parts = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
        .trim.split("\\s+")
      Some(Log(parts(0).toLong, parts(1).toLong,
        parts.drop(2).map(_.toLong).toVector))
    }
  }

  private def writeLog(root: String, log: Log): Unit = {
    val body = (Seq(log.batchId.toString, log.baseVersion.toString) ++
      log.deltas.map(_.toString)).mkString(" ")
    val tmp = Paths.get(root, "_LOG.tmp")
    Files.createDirectories(Paths.get(root))
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(root, "_LOG"),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }

  /** Current state (id, rev, doc): merge-on-read over base + deltas. */
  def readState(spark: SparkSession, root: String): DataFrame =
    readLog(root) match {
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], stateSchema)
      case Some(log) =>
        val base =
          if (log.baseVersion < 0) None
          else Some(spark.read.schema(stateSchema)
            .parquet(s"$root/base/v=${log.baseVersion}")
            .select(col("id"), col("rev"), col("doc"),
              lit(false).as("deleted"), lit(0L).as("seq"),
              lit(-1L).as("epoch")))
        val deltas = log.deltas.map(d =>
          spark.read.schema(deltaSchema).parquet(s"$root/delta/d=$d")
            .withColumn("epoch", lit(d)))
        val all = (base.toSeq ++ deltas).reduceOption(_ unionByName _)
        all match {
          case None => spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], stateSchema)
          case Some(u) =>
            // latest (epoch, seq) wins per id; tombstones drop the row
            u.groupBy(col("id"))
              .agg(max_by(struct(col("rev"), col("doc"), col("deleted")),
                struct(col("epoch"), col("seq"))).as("__top"))
              .where(!col("__top.deleted"))
              .select(col("id"), col("__top.rev").as("rev"),
                col("__top.doc").as("doc"))
        }
    }

  /** Append one micro-batch as a delta (O(batch) write). The batch is
    * collapsed to max(seq) per key first; rev-equality NOOPs against
    * the CURRENT state are filtered so echoes never enter the log.
    * Compacts when the log exceeds `compactEvery`.
    *
    * COST NOTE: the echo filter reads current state (merge-on-read), so
    * a batch costs O(state read) + O(batch write) — still 3.5× faster
    * than the snapshot sink on the measured incremental regime because
    * reads dodge the write amplification. A pure-append variant could
    * skip the read entirely (CouchDB revs are content-addressed, so a
    * replayed echo folds away at read time); it would relax the
    * insert-only type-exclusion semantics (P8) and is left for the
    * compaction-policy follow-up. */
  def applyBatch(
      root: String,
      batch: DataFrame,
      batchId: Long,
      compactEvery: Int = 16,
      excludeTypes: Set[String] = Set.empty): Boolean = {
    val spark = batch.sparkSession
    val log = readLog(root)
    if (log.exists(_.batchId >= batchId)) return false // replay NOOP
    val current = readState(spark, root)
      .select(col("id").as("s_id"), col("rev").as("s_rev"))
    val latest = ChangeApply.latestPerKey(batch)
    val excluded =
      if (excludeTypes.isEmpty) lit(false)
      else get_json_object(col("doc"), "$.type").isin(excludeTypes.toSeq: _*)
    val effective = latest
      .join(current, col("id") === col("s_id"), "left_outer")
      // echo (same rev) -> drop; delete of absent -> drop; excluded
      // type insert -> drop (updates to present docs still pass, P8)
      .where(
        when(col("deleted"), col("s_id").isNotNull)
          .otherwise(
            (col("s_rev").isNull || col("s_rev") =!= col("rev")) &&
              !(col("s_id").isNull && excluded)))
      .select(col("id"), col("rev"), col("doc"), col("deleted"), col("seq"))
    effective.write.mode("overwrite").parquet(s"$root/delta/d=$batchId")
    val newLog = log match {
      case Some(l) => Log(batchId, l.baseVersion, l.deltas :+ batchId)
      case None => Log(batchId, -1L, Vector(batchId))
    }
    writeLog(root, newLog)
    if (newLog.deltas.size > compactEvery) compact(spark, root)
    true
  }

  /** Fold the delta log into a new base snapshot. */
  def compact(spark: SparkSession, root: String): Unit = {
    val log = readLog(root).getOrElse(return)
    if (log.deltas.isEmpty) return
    val v = log.baseVersion + 1
    readState(spark, root).write.mode("overwrite")
      .parquet(s"$root/base/v=$v")
    writeLog(root, Log(log.batchId, v, Vector.empty))
    log.deltas.foreach(d => deleteRecursive(Paths.get(s"$root/delta/d=$d")))
    if (log.baseVersion >= 0)
      deleteRecursive(Paths.get(s"$root/base/v=${log.baseVersion}"))
  }

  /** foreachBatch hook. */
  def forBatch(root: String, compactEvery: Int = 16,
      excludeTypes: Set[String] = Set.empty): (DataFrame, Long) => Unit =
    (df, id) => { applyBatch(root, df, id, compactEvery, excludeTypes); () }

  private def deleteRecursive(p: java.nio.file.Path): Unit =
    if (Files.exists(p))
      Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(f => Files.deleteIfExists(f))
}
