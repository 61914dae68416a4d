package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** RangeJoin.bandJoin must emit exactly the pairs the naive non-equi
  * join would — once each — including at the band boundaries where the
  * bucket arithmetic is easiest to get wrong.
  */
class RangeJoinSpec extends SparkSpec {

  test("bandJoin equals the naive range join, each pair exactly once") {
    import spark.implicits._
    // deterministic pseudo-random axis values, including exact bucket
    // multiples (i*w) and off-by-one neighbours
    val w = 100L
    val axes = (0 until 200).map { i =>
      val base = (i.toLong * 7919L) % 2000L
      if (i % 5 == 0) (i / 5).toLong * w // exact multiples of the width
      else if (i % 5 == 1) (i / 5).toLong * w - 1L
      else base
    }
    val left = axes.zipWithIndex.map { case (x, i) => (i.toLong, x) }
      .toDF("l_id", "l_x")
    val right = axes.zipWithIndex.map { case (x, i) => (i.toLong + 1000L, x) }
      .toDF("r_id", "r_x")

    val got = RangeJoin.bandJoin(left, right, col("l_x"), col("r_x"),
        lo = -w, hi = 0L)
      .select($"l_id", $"r_id").as[(Long, Long)].collect().sorted.toSeq
    val want = left.crossJoin(right)
      .where($"r_x" >= $"l_x" - w && $"r_x" < $"l_x")
      .select($"l_id", $"r_id").as[(Long, Long)].collect().sorted.toSeq

    assert(want.nonEmpty, "test data produced no pairs — not exercising anything")
    assert(got == want)
  }

  test("bandJoin boundary semantics: lo inclusive, hi exclusive") {
    import spark.implicits._
    val left = Seq((1L, 1000L)).toDF("l_id", "l_x")
    val right = Seq(
      (10L, 900L), // == x + lo -> included
      (11L, 899L), // just below lo -> excluded
      (12L, 999L), // hi - 1 -> included
      (13L, 1000L) // == x + hi -> excluded
    ).toDF("r_id", "r_x")
    val got = RangeJoin.bandJoin(left, right, col("l_x"), col("r_x"),
        lo = -100L, hi = 0L)
      .select($"r_id").as[Long].collect().sorted.toSeq
    assert(got == Seq(10L, 12L))
  }

  test("bandJoin with a forward-looking band") {
    import spark.implicits._
    val left = Seq((1L, 500L)).toDF("l_id", "l_x")
    val right = Seq(
      (20L, 500L), // == x + lo (lo = 0) -> included
      (21L, 549L), // inside -> included
      (22L, 550L), // == x + hi -> excluded
      (23L, 499L) // below -> excluded
    ).toDF("r_id", "r_x")
    val got = RangeJoin.bandJoin(left, right, col("l_x"), col("r_x"),
        lo = 0L, hi = 50L)
      .select($"r_id").as[Long].collect().sorted.toSeq
    assert(got == Seq(20L, 21L))
  }

  test("bandJoin plans an equi-join on the bucket, not a nested loop") {
    import spark.implicits._
    val left = Seq((1L, 1000L)).toDF("l_id", "l_x")
    val right = Seq((10L, 900L)).toDF("r_id", "r_x")
    val plan = RangeJoin.bandJoin(left, right, col("l_x"), col("r_x"),
        lo = -100L, hi = 0L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
