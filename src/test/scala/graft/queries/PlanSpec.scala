package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

import graft.{SparkSpec, SparkEntry}

/** Plan-discipline specs: the physical plans that must hold at 100 TB —
  * filter pushdown to the scan, column pruning, broadcast for dims,
  * partial (map-side) aggregation, top-k instead of full sort, and no
  * cartesian products in the LSH joins.
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  test("q2: filter and projection reach the parquet scan") {
    val p = plan("q2_filter_project")
    assert(p.contains("PushedFilters:"))
    assert(p.contains("IsNotNull(l_shipdate)") || p.contains("LessThan(l_shipdate"))
    // column pruning: scan reads only the needed columns, not all 16
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_tax"))
  }

  test("q13: dimension joins are broadcast, not shuffled") {
    val p = plan("q13_dim_join")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q1: aggregation is partial (map-side) then final") {
    val p = plan("q1_pricing_summary")
    val hashAggs = p.linesIterator.count(_.contains("HashAggregate"))
    assert(hashAggs >= 2, s"expected partial+final HashAggregate:\n$p")
  }

  test("q4: global top-k compiles to TakeOrdered, not a full sort") {
    val p = plan("q4_topk_orders")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("LSH pair joins are equi-joins on band keys (no cartesian)") {
    for (name <- Seq("p2_minhash_lsh", "p4_simhash_pairs")) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name has a cartesian:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin") || p.contains("HashJoin"),
        s"$name joins without an equi-key:\n$p")
    }
  }

  test("ANN brute force broadcasts the query set (corpus never shuffles)") {
    val p = plan("p7_ann_brute")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("whole-stage codegen covers the custom hash expressions") {
    // AQE shows codegen spans only in the final plan: execute first
    val df = SparkEntry.queries("p3_simhash_sig")(spark, dir)
    df.collect()
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    // the SimHash projection must be inside a codegen stage ("[codegen
    // id : N]" tag), not a standalone interpreted Project — this is the
    // whole point of the custom expression over the HOF formulation
    val projLine = p.linesIterator
      .dropWhile(!_.matches(".*\\(\\d+\\) Project.*")).take(2).mkString("\n")
    assert(projLine.contains("codegen id"), s"Project not codegen'd:\n$p")
    assert(p.contains("simhashexpr"))
  }
}
