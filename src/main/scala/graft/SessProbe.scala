package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the stateful-streaming gates' phases (staging
  * vs streaming machinery vs per-batch durations) — drives the SAME
  * staging helper the j39/j40/j41 entries use, so it measures the
  * gated shape, not a diverged copy.
  * SPARK_GRAFT_SF_DIR=... sbt "runMain graft.SessProbe" */
object SessProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    // warm the session
    Tables.load(spark, sfDir, "events").where($"user_id" < 40).count()
    val base = java.nio.file.Files.createTempDirectory("sessprobe")
    val (ev, src) = t("staging") {
      graft.queries.JsonDoc.stageEventStream(spark, sfDir, base, 40L)
    }
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    val qname = "sessprobe_out"
    val q = t("stream-start") {
      graft.streaming.StatefulOps.sessionRollup(
        spark.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", "1").parquet(src.toString),
        delay = Some("2 hours"), flag = col("event_type") === "purchase")
      .writeStream.format("memory").queryName(qname)
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
      .option("checkpointLocation",
        base.resolve("ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    }
    t("stream-drain") { q.awaitTermination() }
    q.recentProgress.foreach { p =>
      println(f"  batch ${p.batchId}%2d rows=${p.numInputRows}%6d " +
        f"trigger=${p.durationMs.getOrDefault("triggerExecution", 0L)}%6d ms " +
        f"addBatch=${p.durationMs.getOrDefault("addBatch", 0L)}%6d " +
        f"getBatch=${p.durationMs.getOrDefault("getBatch", 0L)}%6d " +
        f"commit=${p.durationMs.getOrDefault("commitOffsets", 0L)}%6d " +
        f"state=${Option(p.stateOperators).map(_.map(_.commitTimeMs).sum).getOrElse(0L)}%6d")
    }
    t("count-out") {
      println("rows=" + spark.table(qname).where($"user_id" >= 0).count())
    }
    t("batch-expected") {
      println("expected=" + graft.operators.Sessionize.rollup(
        ev, key = "user_id", ts = "ts", gapMicros = 1800L * 1000000L,
        flag = col("event_type") === "purchase").count())
    }
  }
}
