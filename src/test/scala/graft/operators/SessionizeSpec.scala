package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SessionizeSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)
  private val gap30m = 1800L * 1000000L

  test("events within the gap share a session; a larger gap splits") {
    import spark.implicits._
    val e = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:20:00")), // 20m -> same session
      (1L, ts("2024-01-01 11:10:00")), // 50m -> new session
      (2L, ts("2024-01-01 10:00:00")))
      .toDF("user_id", "t")
    val out = Sessionize.assign(e, "user_id", "t", gap30m)
      .orderBy($"user_id", $"t")
      .select($"user_id", $"session_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 1L), (1L, 1L), (1L, 2L), (2L, 1L)))
  }

  test("a gap of exactly the threshold does NOT split (strict >)") {
    import spark.implicits._
    val e = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:30:00"))) // exactly 30m
      .toDF("user_id", "t")
    val ids = Sessionize.assign(e, "user_id", "t", gap30m)
      .select($"session_id").distinct().count()
    assert(ids == 1L)
  }

  test("rollup: counts, whole-second span, flagged events") {
    import spark.implicits._
    val e = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:10:30"), "purchase"),
      (1L, ts("2024-01-01 20:00:00"), "view"))
      .toDF("user_id", "t", "kind")
    val out = Sessionize.rollup(e, "user_id", "t", gap30m,
        flag = $"kind" === "purchase")
      .orderBy($"session_id")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq((1L, 2L, 630L, 1L), (2L, 1L, 0L, 0L)))
  }

  test("session windows partition by key — no global single-partition sort") {
    import spark.implicits._
    val e = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("user_id", "t")
    val p = Sessionize.assign(e, "user_id", "t", gap30m)
      .queryExecution.executedPlan.toString
    assert(p.contains("windowspecdefinition(user_id"), s"window not keyed:\n$p")
  }
}
