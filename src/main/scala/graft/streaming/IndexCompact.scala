package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StringType

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
  * key -> one file per partition, renamed to deterministic
  * `compact-<i>.parquet` while still staged), then swap each partition
  * in with two directory renames: live -> `_old_`, staged -> live.
  * Batch logs, verdicts, and checkpoints are untouched, so replay
  * idempotence and batch-id continuation survive compaction.
  *
  * Durability: a crash between the two renames hides that partition's
  * only copy in its `_old_` dir — so every run starts with a recovery
  * scan that moves any `_old_<part>` whose live counterpart is missing
  * or empty back into place before reading. Re-running the compaction
  * therefore recovers. A sink batch that merges into a partition
  * between the compaction read and that partition's swap lands a
  * `batch-*.parquet` in the moved-away live dir; before the `_old_`
  * tree is deleted, any file NOT in the read's input snapshot is moved
  * back into the live dir (its rows were not in the fold), so the
  * documented batch-boundary contract degrades to a repair rather than
  * silent loss.
  */
object IndexCompact {

  def compactPartitions(
      spark: SparkSession, root: String, partCol: String): Unit =
    compactPartitions(spark, root, partCol, () => ())

  /** `afterFold` fires between the fold's materialization and the first
    * directory swap — the race window a concurrent sink batch can land
    * in. Specs use it to pin the extras-preserving swap; production
    * callers take the no-op overload above. */
  private[streaming] def compactPartitions(
      spark: SparkSession, root: String, partCol: String,
      afterFold: () => Unit): Unit = {
    val rootP = Paths.get(root)
    if (!Files.exists(rootP)) return
    def partDirs(base: Path): Seq[Path] =
      scala.util.Using.resource(Files.list(base)) { st =>
        st.iterator().asScala
          .filter(p => Files.isDirectory(p) &&
            p.getFileName.toString.startsWith(s"$partCol="))
          .toSeq.sortBy(_.getFileName.toString)
      }
    def parquetFiles(dir: Path): Seq[Path] =
      if (!Files.exists(dir)) Seq.empty
      else scala.util.Using.resource(Files.list(dir)) { st =>
        st.iterator().asScala
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .toSeq.sortBy(_.getFileName.toString)
      }
    // Recovery: a prior run that crashed between its two swap renames
    // left the partition's only copy under _old_<part>. Restore any
    // such dir whose live counterpart is missing or has no data files,
    // so "re-run the compaction" actually recovers.
    scala.util.Using.resource(Files.list(rootP)) { st =>
      st.iterator().asScala
        .filter(p => Files.isDirectory(p) &&
          p.getFileName.toString.startsWith(s"_old_$partCol="))
        .toList
    }.foreach { old =>
      val live = rootP.resolve(old.getFileName.toString.stripPrefix("_old_"))
      if (parquetFiles(live).isEmpty) {
        deleteTree(live)
        Files.move(old, live, StandardCopyOption.ATOMIC_MOVE)
      } else deleteTree(old) // swap completed; leftover originals
    }
    val liveDirs = partDirs(rootP)
    if (liveDirs.isEmpty) return
    val next = rootP.resolve("_compact_tree")
    deleteTree(next)
    // Snapshot of the read's input files, per partition dir: anything a
    // concurrent sink batch adds after this point is NOT in the fold
    // and must survive the swap.
    val snapshot: Map[String, Set[String]] = liveDirs.map { d =>
      d.getFileName.toString ->
        parquetFiles(d).map(_.getFileName.toString).toSet
    }.toMap
    // Full materialization of the fold BEFORE any live dir moves.
    // The read supplies an explicit schema with the partition column as
    // STRING, which (a) skips partition TYPE INFERENCE — the ANN
    // sign-bucket values are strings like "0101" that inference folds
    // to int 101, which would rewrite the partition under a DIFFERENT
    // directory name and duplicate its rows beside the un-swapped
    // original — and (b) avoids mutating session conf, so concurrent
    // queries on the shared SparkSession are unaffected. The string
    // value round-trips verbatim through partitionBy (int-valued
    // partitions like bk=5 write the same name either way).
    val sampleOpt = liveDirs.iterator.flatMap(parquetFiles).nextOption()
    if (sampleOpt.isEmpty) return
    val dataSchema = spark.read.parquet(sampleOpt.get.toString).schema
    spark.read.schema(dataSchema.add(partCol, StringType)).parquet(root)
      .repartition(col(partCol))
      .write.mode("overwrite").partitionBy(partCol).parquet(next.toString)
    afterFold()
    partDirs(next).foreach { dir =>
      // deterministic names, renamed while still staged (no visibility
      // window): the swap below is then a single directory rename.
      parquetFiles(dir).zipWithIndex.foreach { case (f, i) =>
        Files.move(f, dir.resolve(s"compact-$i.parquet"),
          StandardCopyOption.REPLACE_EXISTING)
      }
      val live = rootP.resolve(dir.getFileName.toString)
      val old = rootP.resolve(s"_old_${dir.getFileName.toString}")
      deleteTree(old)
      if (Files.exists(live))
        Files.move(live, old, StandardCopyOption.ATOMIC_MOVE)
      Files.move(dir, live, StandardCopyOption.ATOMIC_MOVE)
      // Any file in old that the read's snapshot did not cover was
      // written by a sink batch mid-compaction: its rows are absent
      // from the fold, so move it back (batch-* names cannot collide
      // with compact-<i> names) instead of discarding it.
      val seen = snapshot.getOrElse(dir.getFileName.toString, Set.empty)
      parquetFiles(old).filterNot(f => seen(f.getFileName.toString))
        .foreach { f =>
          Files.move(f, live.resolve(f.getFileName.toString),
            StandardCopyOption.ATOMIC_MOVE)
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
