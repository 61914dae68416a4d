package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.Sessionize

/** Streaming session_window must produce the SAME sessions as the batch
  * gap-sessionization operator (q26), regardless of how the stream is
  * split into micro-batches — the session state store merges windows
  * across batches.
  */
class SessionizeEquivSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)
  private val gapMicros = 1800L * 1000000L

  // two users, interleaved sessions, one session spanning micro-batches,
  // one single-event session, purchases scattered
  private val events: Seq[(Long, Timestamp, String)] = Seq(
    (1L, ts("2024-01-01 10:00:00"), "view"),
    (1L, ts("2024-01-01 10:10:00"), "purchase"),
    (2L, ts("2024-01-01 10:05:00"), "view"),
    (1L, ts("2024-01-01 10:35:00"), "view"),      // still session 1 (25m)
    (2L, ts("2024-01-01 11:30:00"), "purchase"),  // user2 session 2
    (1L, ts("2024-01-01 13:00:00"), "view"),      // user1 session 2
    (1L, ts("2024-01-01 13:20:00"), "purchase"),
    (2L, ts("2024-01-01 11:40:00"), "view"))      // joins user2 session 2

  private def batchSessions(): Set[(Long, Timestamp, Long, Long, Long)] = {
    import spark.implicits._
    Sessionize.assign(events.toDF("user_id", "ts", "kind"),
        "user_id", "ts", gapMicros)
      .groupBy($"user_id", $"session_id")
      .agg(min($"ts").as("session_start"),
        count(lit(1)).as("n_events"),
        (unix_timestamp(max($"ts")) - unix_timestamp(min($"ts")))
          .as("duration_s"),
        sum(when($"kind" === "purchase", 1L).otherwise(0L)).as("n_flagged"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toSet
  }

  test("streaming session_window equals batch sessionize, any batch split") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val sessions = StatefulOps.sessionRollup(
      input.toDF().toDF("user_id", "ts", "kind"),
      delay = None, // complete mode: emit every session every batch
      flag = col("kind") === "purchase")
    val ckpt = Files.createTempDirectory("sess").toString
    val q = sessions.writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Complete)
      .option("checkpointLocation", ckpt)
      .start()
    try {
      // split mid-session: user1's 10:35 event arrives a batch after
      // 10:00/10:10 — the state store must extend the open session
      input.addData(events.take(3))
      q.processAllAvailable()
      input.addData(events.slice(3, 5))
      q.processAllAvailable()
      input.addData(events.drop(5))
      q.processAllAvailable()
      val streamed = spark.table("sess_out")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
        .toSet
      assert(streamed == batchSessions(), s"streaming=$streamed")
      assert(streamed.size == 4) // 2 sessions per user
    } finally q.stop()
  }
}
