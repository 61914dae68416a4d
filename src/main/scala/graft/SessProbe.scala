package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for j39's phases (staging vs streaming vs batches).
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
    val src = base.resolve("stream")
    java.nio.file.Files.createDirectories(src)
    val ev = Tables.load(spark, sfDir, "events").where($"user_id" < 40)
      .select($"user_id", $"ts", $"event_type")
    val (tsLo, tsHi) = t("minmax") {
      val r = ev.agg(min($"ts"), max($"ts")).collect().head
      (r.getTimestamp(0), r.getTimestamp(1))
    }
    val spanMs = tsHi.getTime - tsLo.getTime
    def cutAt(frac: Double) =
      new java.sql.Timestamp(tsLo.getTime + (spanMs * frac).toLong)
    val chunks = Seq(
      ev.where($"ts" < cutAt(0.4)),
      ev.where($"ts" >= cutAt(0.4) && $"ts" < cutAt(0.7)),
      ev.where($"ts" >= cutAt(0.7)))
    def sentinel(uid: Long, h: Long) = Seq((uid,
      new java.sql.Timestamp(tsHi.getTime + h * 3600 * 1000), "view"))
      .toDF("user_id", "ts", "event_type")
    t("staging") {
      (chunks :+ sentinel(-1L, 6L) :+ sentinel(-2L, 7L))
        .zipWithIndex.foreach { case (df, i) =>
          val tmp = base.resolve(s"chunk$i")
          df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
          val it = java.nio.file.Files.list(tmp).iterator()
          var f: java.nio.file.Path = null
          while (it.hasNext) { val p = it.next()
            if (p.toString.endsWith(".parquet")) f = p }
          val dst = src.resolve(f"$i%02d.parquet")
          java.nio.file.Files.move(f, dst)
          java.nio.file.Files.setLastModifiedTime(dst,
            java.nio.file.attribute.FileTime.fromMillis(1000000L + i * 2000L))
        }
    }
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    val qname = "sessprobe_out"
    val q = t("stream-start") {
      graft.streaming.StatefulOps.sessionRollup(
        spark.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", "1").parquet(src.toString),
        delay = Some("2 hours"), flag = $"event_type" === "purchase")
      .writeStream.format("memory").queryName(qname)
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
      .option("checkpointLocation", base.resolve("ckpt").toString)
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
        flag = $"event_type" === "purchase").count())
    }
  }
}
