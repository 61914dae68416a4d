package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Shared LSM-style maintenance for the streaming index sinks
  * ([[LshDedupSink]], [[AnnIndexSink]]): fold the one-file-per-batch
  * accumulation inside every `<partCol>=` directory back to ONE file per
  * partition, answer-preserving — the same fold [[graft.pipeline
  * .Retrieval.compact]] runs for the inverted index and
  * [[DeltaLogMergeSink.compact]] for the doc store. Without it a
  * standing 100 TB ingest accumulates a small file per touched
  * partition per micro-batch forever; with it the file count is bounded
  * by the partition fanout between compactions.
  *
  * Mechanics: read the live rows (parquet partition discovery skips the
  * `_`-prefixed batch log / verdicts), re-write them `repartition(part)`
  * + `partitionBy(part)` into a hidden `_compact_tree` (one task per
  * key -> one file per partition), then swap each partition directory
  * into place with deterministic `compact-<i>.parquet` names. Batch
  * logs, verdicts, and checkpoints are untouched, so replay idempotence
  * and batch-id continuation survive compaction.
  *
  * Durability note (same exposure as `Retrieval.compact`, the repo
  * precedent): each directory swap is move-away + move-in, so a crash
  * between the two moves hides that one partition until the compaction
  * is re-run — compaction is explicit maintenance outside the sink's
  * crash-replay contract, not part of the streaming commit path.
  */
object IndexCompact {

  def compactPartitions(
      spark: SparkSession, root: String, partCol: String): Unit = {
    val rootP = Paths.get(root)
    if (!Files.exists(rootP)) return
    def partDirs(base: Path): Seq[Path] =
      scala.util.Using.resource(Files.list(base)) { st =>
        st.iterator().asScala
          .filter(p => Files.isDirectory(p) &&
            p.getFileName.toString.startsWith(s"$partCol="))
          .toSeq.sortBy(_.getFileName.toString)
      }
    if (partDirs(rootP).isEmpty) return
    val next = rootP.resolve("_compact_tree")
    deleteTree(next)
    // full materialization of the fold BEFORE any live dir moves.
    // Partition TYPE INFERENCE must be off for this read: the ANN
    // sign-bucket values are strings like "0101" that inference folds
    // to int 101, which would rewrite the partition under a DIFFERENT
    // directory name and duplicate its rows beside the un-swapped
    // original. With inference off the value round-trips verbatim
    // (int-valued partitions like bk=5 write the same name either way).
    val inferKey = "spark.sql.sources.partitionColumnTypeInference.enabled"
    val prevInfer = spark.conf.get(inferKey, "true")
    spark.conf.set(inferKey, "false")
    try
      spark.read.parquet(root)
        .repartition(col(partCol))
        .write.mode("overwrite").partitionBy(partCol).parquet(next.toString)
    finally spark.conf.set(inferKey, prevInfer)
    partDirs(next).foreach { dir =>
      val live = rootP.resolve(dir.getFileName.toString)
      val old = rootP.resolve(s"_old_${dir.getFileName.toString}")
      deleteTree(old)
      if (Files.exists(live))
        Files.move(live, old, StandardCopyOption.ATOMIC_MOVE)
      Files.createDirectories(live)
      val parts = scala.util.Using.resource(Files.list(dir)) { st =>
        st.iterator().asScala
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .toSeq.sortBy(_.getFileName.toString)
      }
      parts.zipWithIndex.foreach { case (f, i) =>
        Files.move(f, live.resolve(s"compact-$i.parquet"),
          StandardCopyOption.REPLACE_EXISTING)
      }
      deleteTree(old)
    }
    deleteTree(next)
  }

  private def deleteTree(d: Path): Unit =
    if (Files.exists(d))
      scala.util.Using.resource(Files.walk(d)) { st =>
        st.sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.toList
      }.foreach(Files.deleteIfExists(_))
}
