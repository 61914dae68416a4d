package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.cdc.ChangeApply

class DeltaLogMergeSinkSpec extends SparkSpec {
  import spark.implicits._

  private def changes(rows: (Long, String, String, Boolean, String)*): DataFrame =
    rows.toDF("seq", "id", "rev", "deleted", "doc")

  private def stateSet(df: DataFrame): Set[(String, String, String)] =
    df.select("id", "rev", "doc").as[(String, String, String)].collect().toSet

  private val empty = Seq.empty[(String, String, String)].toDF("id", "rev", "doc")

  test("delta-log apply == flat ChangeApply over the same batches") {
    val root = Files.createTempDirectory("dls").toString
    val b1 = changes(
      (1L, "a", "1-x", false, """{"v":1}"""),
      (2L, "b", "1-y", false, """{"v":2}"""),
      (3L, "c", "1-z", false, """{"v":3}"""))
    val b2 = changes(
      (4L, "a", "2-x2", false, """{"v":11}"""), // update
      (5L, "b", "1-y", false, """{"v":2}"""), // echo -> filtered from log
      (6L, "c", "2-z", true, null), // delete tombstone
      (7L, "d", "1-d", false, """{"v":4}""")) // insert
    DeltaLogMergeSink.applyBatch(root, b1, 0)
    DeltaLogMergeSink.applyBatch(root, b2, 1)
    val expected = ChangeApply.applyAll(empty, Seq(b1, b2))
    assert(stateSet(DeltaLogMergeSink.readState(spark, root)) ==
      stateSet(expected))
    // the echo row never entered the log
    val d1 = spark.read.parquet(s"$root/delta/d=1")
    assert(!d1.filter($"id" === "b").collect().exists(_ != null))
  }

  test("replayed batchId is a NOOP") {
    val root = Files.createTempDirectory("dls2").toString
    val b = changes((1L, "x", "1-a", false, """{"v":1}"""))
    assert(DeltaLogMergeSink.applyBatch(root, b, 0))
    assert(!DeltaLogMergeSink.applyBatch(root, b, 0))
    assert(DeltaLogMergeSink.readState(spark, root).count() == 1)
  }

  test("compaction folds deltas into a base and preserves state") {
    val root = Files.createTempDirectory("dls3").toString
    // 5 batches with compactEvery=3 -> auto-compaction mid-stream
    (0 until 5).foreach { i =>
      DeltaLogMergeSink.applyBatch(root,
        changes((i * 10 + 1L, s"k${i % 3}", s"${i + 1}-r$i", false,
          s"""{"n":$i}""")), i, compactEvery = 3)
    }
    val log = DeltaLogMergeSink.readLog(root).get
    assert(log.baseVersion >= 0) // compacted at least once
    assert(log.deltas.size <= 3)
    val st = stateSet(DeltaLogMergeSink.readState(spark, root))
    // k0 latest from batch 3, k1 from batch 4, k2 from batch 2
    assert(st == Set(
      ("k0", "4-r3", """{"n":3}"""),
      ("k1", "5-r4", """{"n":4}"""),
      ("k2", "3-r2", """{"n":2}""")))
    // explicit compact drains the log completely
    DeltaLogMergeSink.compact(spark, root)
    assert(DeltaLogMergeSink.readLog(root).get.deltas.isEmpty)
    assert(stateSet(DeltaLogMergeSink.readState(spark, root)) == st)
  }

  test("delete of absent doc and excluded type never enter the log") {
    val root = Files.createTempDirectory("dls4").toString
    DeltaLogMergeSink.applyBatch(root, changes(
      (1L, "ghost", "1-a", true, null),
      (2L, "skip", "1-b", false, """{"type":"Bad"}"""),
      (3L, "keep", "1-c", false, """{"type":"Good"}""")),
      0, excludeTypes = Set("Bad"))
    val st = stateSet(DeltaLogMergeSink.readState(spark, root))
    assert(st == Set(("keep", "1-c", """{"type":"Good"}""")))
    assert(spark.read.parquet(s"$root/delta/d=0").count() == 1)
  }
}
