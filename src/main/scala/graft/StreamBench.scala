package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.streaming.{ChangesPipeline, MergeSink}

/** End-to-end CDC ingest benchmark: JSONL `_changes` feed → DataSource
  * V2 source → micro-batches → rev-guarded merge → doc store, through
  * the REAL streaming machinery (offsets, checkpoint, versioned state).
  *
  * Yardstick (BASELINE.md): the reference syncs 63.8 k docs in 1 m 42 s
  * ≈ 625 docs/s with per-change SQL round-trips. Usage:
  *
  *   runMain graft.StreamBench [nDocs] [maxPerTrigger]
  *
  * Prints one JSON line {"metric":"stream_ingest","docs":N,
  * "sec":S,"docs_per_sec":R,"batches":B}.
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(63840)
    val maxPerTrigger = args.lift(1).map(_.toLong)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = Files.createTempDirectory("streambench")
    val feed = dir.resolve("feed")
    Files.createDirectories(feed)
    // ~10% deletes, ~20% second revisions — the reference's workload mix
    val sb = new java.lang.StringBuilder
    (1 to n).foreach { i =>
      sb.append(s"""{"seq":$i,"id":"doc${i % (n * 8 / 10)}","changes":[{"rev":"${i % 3 + 1}-r$i"}]""")
      if (i % 10 == 0) sb.append(""","deleted":true""")
      else sb.append(s""","doc":{"n":$i,"type":"article","body":"payload $i"}""")
      sb.append("}\n")
    }
    Files.writeString(feed.resolve("changes.jsonl"), sb.toString)

    val store = dir.resolve("store").toString
    val ckpt = dir.resolve("ckpt").toString
    val t0 = System.nanoTime()
    ChangesPipeline.runOnce(spark, feed.toString, store, ckpt,
      name = "stream-bench", maxChangesPerTrigger = maxPerTrigger)
    val sec = (System.nanoTime() - t0) / 1e9
    val live = MergeSink.readState(spark, store).count()
    val batches = MergeSink.currentVersion(store).map(_._2 + 1).getOrElse(0L)
    println(f"""{"metric":"stream_ingest","docs":$n,"sec":$sec%.2f,"docs_per_sec":${n / sec}%.0f,"live_docs":$live,"batches":$batches}""")
    spark.stop()
  }
}
