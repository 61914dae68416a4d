package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("backward as-of: latest prior right row per left row") {
    import spark.implicits._
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "p1"),
      (1L, ts("2024-01-01 12:00:00"), "p2"),
      (2L, ts("2024-01-01 09:00:00"), "p3"))
      .toDF("k", "t", "name")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 100L),
      (1L, ts("2024-01-01 11:30:00"), 101L),
      (2L, ts("2024-01-01 09:30:00"), 200L)) // after left -> not visible
      .toDF("k", "t", "rid")
    val out = AsOfJoin.backward(left, right, "k", "t", "t", Seq("rid"))
      .orderBy($"name")
      .select($"name", $"asof_rid")
      .collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(out.toSeq == Seq(("p1", 100L), ("p2", 101L), ("p3", -1L)))
  }

  test("a right row at exactly the left time is visible (<= semantics)") {
    import spark.implicits._
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "p")).toDF("k", "t", "name")
    val right = Seq((1L, ts("2024-01-01 10:00:00"), 7L)).toDF("k", "t", "rid")
    val out = AsOfJoin.backward(left, right, "k", "t", "t", Seq("rid"))
      .select($"asof_rid").collect()
    assert(out.head.getLong(0) == 7L)
  }

  test("keys never matched on the right side carry nulls") {
    import spark.implicits._
    val left = Seq((9L, ts("2024-01-01 10:00:00"), "p")).toDF("k", "t", "name")
    val right = Seq((1L, ts("2024-01-01 09:00:00"), 7L)).toDF("k", "t", "rid")
    val out = AsOfJoin.backward(left, right, "k", "t", "t", Seq("rid"))
      .select($"asof_rid").collect()
    assert(out.head.isNullAt(0))
  }

  test("plan shuffles once on the key — no pair-exploding range join") {
    import spark.implicits._
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "p")).toDF("k", "t", "name")
    val right = Seq((1L, ts("2024-01-01 09:00:00"), 7L)).toDF("k", "t", "rid")
    val p = AsOfJoin.backward(left, right, "k", "t", "t", Seq("rid"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("Join"),
      s"as-of must not plan a join:\n$p")
    // the window partitions by key: no single-partition global window
    assert(p.contains("windowspecdefinition(__k"), s"window not keyed:\n$p")
  }
}
