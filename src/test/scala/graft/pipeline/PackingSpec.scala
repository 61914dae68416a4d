package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {

  test("packShards: contiguous fill, exact div/mod, docs may straddle") {
    import spark.implicits._
    val d = Seq((1L, 40L), (2L, 70L), (3L, 10L), (4L, 100L), (5L, 5L))
      .toDF("doc_id", "tokens")
    val got = Packing.packShards(d, "doc_id", "tokens", budget = 100L)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSeq
    // prefixes: 0, 40, 110, 120, 220
    assert(got == Seq((1L, 0L, 0L), (2L, 0L, 40L), (3L, 1L, 10L),
      (4L, 1L, 20L), (5L, 2L, 20L)))
  }

  test("packShards: result is independent of partition count") {
    import spark.implicits._
    val d = (1L to 500L).map(i => (i, i % 37 + 1)).toDF("doc_id", "tokens")
    val p1 = Packing.packShards(d, "doc_id", "tokens", 100L, numParts = 1)
      .orderBy("doc_id").collect().toSeq
    val p7 = Packing.packShards(d, "doc_id", "tokens", 100L, numParts = 7)
      .orderBy("doc_id").collect().toSeq
    val p64 = Packing.packShards(d, "doc_id", "tokens", 100L, numParts = 64)
      .orderBy("doc_id").collect().toSeq
    assert(p1 == p7 && p7 == p64)
  }

  test("packShards: every shard except the last spans exactly the budget") {
    import spark.implicits._
    val d = (1L to 200L).map(i => (i, (i * 13) % 50 + 1)).toDF("doc_id", "tokens")
    val out = Packing.packShards(d, "doc_id", "tokens", 128L)
    // shard token mass = budget for all shards but the last: a shard's
    // span is [shard*budget, (shard+1)*budget) over the global prefix
    // line, and every prefix position is covered by exactly one doc
    val total = out.agg(sum("tokens")).collect().head.getLong(0)
    val lastShard = total / 128L
    val spans = out.groupBy("shard_id")
      .agg(min(col("shard_offset")).as("lo"))
      .orderBy("shard_id").collect()
    // contiguity: every shard starts where a doc lands (offset bounded)
    assert(spans.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 128L))
    assert(spans.map(_.getLong(0)).toSeq == (0L to lastShard).toSeq ||
      spans.map(_.getLong(0)).toSeq == (0L until lastShard).toSeq)
  }

  test("property: distributed scan equals the sequential prefix sum") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val n = 50 + rng.nextInt(300)
      val budget = 1L + rng.nextInt(500)
      val parts = 1 + rng.nextInt(40)
      // non-contiguous ids, arbitrary token counts (incl. > budget)
      val docs = (1 to n).map(i =>
        (i * 7L + rng.nextInt(5), rng.nextInt(3 * budget.toInt).toLong))
        .distinctBy(_._1)
      val got = Packing.packShards(docs.toDF("doc_id", "tokens"),
        "doc_id", "tokens", budget, numParts = parts)
        .orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
      // sequential oracle: running exclusive prefix in id order
      var prefix = 0L
      val expect = docs.sortBy(_._1).map { case (id, tk) =>
        val row = (id, prefix / budget, prefix % budget)
        prefix += tk
        row
      }
      assert(got.toSeq == expect,
        s"trial $trial (n=$n budget=$budget parts=$parts) diverged")
    }
  }

  test("packShards: no unpartitioned window in the plan (scale shape)") {
    import spark.implicits._
    val d = (1L to 100L).map(i => (i, 10L)).toDF("doc_id", "tokens")
    val plan = Packing.packShards(d, "doc_id", "tokens", 100L)
      .queryExecution.executedPlan.toString
    // the global scan must NOT serialize through a single-partition
    // window: the only Window is partitioned by _pid
    assert(!plan.contains("Window [") ||
      plan.linesIterator.filter(_.contains("windowspecdefinition"))
        .forall(_.contains("_pid")),
      s"unpartitioned window found:\n$plan")
  }

  test("writeShards: one file per shard dir, pruned reads, manifest ties out") {
    import spark.implicits._
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val out = Files.createTempDirectory("shards").toString + "/packed"
    val d = (1L to 120L).map(i => (i, s"doc-$i body", (i * 13) % 50 + 1))
      .toDF("doc_id", "text", "tokens")
    val manifest = Packing.writeShards(d, "doc_id", "tokens", budget = 500L, out)
      .collect()
    // manifest totals cover every doc and token exactly once
    assert(manifest.map(_.getLong(1)).sum == 120L)
    assert(manifest.map(_.getLong(2)).sum ==
      (1L to 120L).map(i => (i * 13) % 50 + 1).sum)
    // shard ranges are contiguous in doc order: next first = prev last + 1
    val ranges = manifest.map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    ranges.sliding(2).foreach {
      case Array((_, _, lastA), (_, firstB, _)) => assert(firstB == lastA + 1)
      case _ => ()
    }
    // exactly one data file per shard_id= dir
    val dirs = Files.list(Paths.get(out)).iterator().asScala
      .filter(_.getFileName.toString.startsWith("shard_id=")).toSeq
    assert(dirs.size == manifest.length)
    dirs.foreach { dir =>
      val files = Files.list(dir).iterator().asScala
        .count(_.getFileName.toString.endsWith(".parquet"))
      assert(files == 1, s"$dir has $files files")
    }
    // a one-shard read is partition-pruned and returns that shard's docs
    val one = spark.read.parquet(out).where($"shard_id" === 0)
    val scan = one.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("shard_id"))
    val m0 = manifest.find(_.getLong(0) == 0L).get
    assert(one.count() == m0.getLong(1))
  }
}
