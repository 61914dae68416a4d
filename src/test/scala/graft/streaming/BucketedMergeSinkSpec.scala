package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.cdc.ChangeApply

class BucketedMergeSinkSpec extends SparkSpec {
  import spark.implicits._

  private def changes(rows: (Long, String, String, Boolean, String)*): DataFrame =
    rows.toDF("seq", "id", "rev", "deleted", "doc")

  private def stateSet(df: DataFrame): Set[(String, String, String)] =
    df.select("id", "rev", "doc").as[(String, String, String)].collect().toSet

  test("bucketed apply == flat ChangeApply over the same batches") {
    val root = Files.createTempDirectory("bms").toString
    val b1 = changes(
      (1L, "a", "1-x", false, """{"v":1}"""),
      (2L, "b", "1-y", false, """{"v":2}"""),
      (3L, "c", "1-z", false, """{"v":3}"""))
    val b2 = changes(
      (4L, "a", "2-x2", false, """{"v":11}"""), // update
      (5L, "b", "1-y", false, """{"v":2}"""), // echo -> NOOP
      (6L, "c", "2-z", true, null), // delete
      (7L, "d", "1-d", false, """{"v":4}""")) // insert
    BucketedMergeSink.applyBatch(root, b1, 0, buckets = 4)
    BucketedMergeSink.applyBatch(root, b2, 1, buckets = 4)

    val empty = Seq.empty[(String, String, String)].toDF("id", "rev", "doc")
    val expected = ChangeApply.applyAll(empty, Seq(b1, b2))
    assert(stateSet(BucketedMergeSink.readState(spark, root)) ==
      stateSet(expected))
  }

  test("replayed batchId is a NOOP") {
    val root = Files.createTempDirectory("bms2").toString
    val b = changes((1L, "x", "1-a", false, """{"v":1}"""))
    assert(BucketedMergeSink.applyBatch(root, b, 0, buckets = 4).nonEmpty)
    assert(BucketedMergeSink.applyBatch(root, b, 0, buckets = 4).isEmpty)
    assert(BucketedMergeSink.readState(spark, root).count() == 1)
  }

  test("only touched buckets get new versions") {
    val root = Files.createTempDirectory("bms3").toString
    // seed many keys across buckets
    val seed = changes((1 to 40).map(i =>
      (i.toLong, s"k$i", "1-a", false, s"""{"n":$i}""")): _*)
    BucketedMergeSink.applyBatch(root, seed, 0, buckets = 8)
    val m0 = BucketedMergeSink.readManifest(root).get

    // update ONE key -> exactly one bucket version bumps
    val one = changes((100L, "k7", "2-b", false, """{"n":700}"""))
    val touched = BucketedMergeSink.applyBatch(root, one, 1, buckets = 8)
    assert(touched.size == 1)
    val m1 = BucketedMergeSink.readManifest(root).get
    val bumped = m0.versions.zip(m1.versions).zipWithIndex
      .filter { case ((a, b), _) => a != b }.map(_._2)
    assert(bumped == touched)

    // untouched bucket directories were not rewritten
    val untouchedDirs = m1.versions.zipWithIndex
      .filterNot { case (_, b) => touched.contains(b) }
      .collect { case (v, b) if v >= 0 => s"$root/b=$b/v=$v" }
    assert(untouchedDirs.forall(d => Files.exists(Paths.get(d))))
    // and the state reflects the update
    val row = BucketedMergeSink.readState(spark, root)
      .filter($"id" === "k7").collect().head
    assert(row.getString(1) == "2-b")
  }

  test("delete can empty a bucket without corrupting the store") {
    val root = Files.createTempDirectory("bms4").toString
    BucketedMergeSink.applyBatch(root,
      changes((1L, "solo", "1-a", false, """{"v":1}""")), 0, buckets = 4)
    BucketedMergeSink.applyBatch(root,
      changes((2L, "solo", "2-a", true, null)), 1, buckets = 4)
    assert(BucketedMergeSink.readState(spark, root).count() == 0)
    // further inserts still work
    BucketedMergeSink.applyBatch(root,
      changes((3L, "next", "1-b", false, """{"v":2}""")), 2, buckets = 4)
    assert(stateSet(BucketedMergeSink.readState(spark, root)) ==
      Set(("next", "1-b", """{"v":2}""")))
  }

  test("streaming pipeline works with the bucketed sink end-to-end") {
    val feed = Files.createTempDirectory("bms-feed")
    Files.write(feed.resolve("f.jsonl"), (1 to 30).map(i =>
      s"""{"seq":$i,"id":"d${i % 10}","changes":[{"rev":"${i / 10 + 1}-r$i"}],"doc":{"n":$i}}""")
      .mkString("\n").getBytes("UTF-8"))
    val root = Files.createTempDirectory("bms-store").toString
    val ckpt = Files.createTempDirectory("bms-ckpt").toString
    val q = spark.readStream.format("couch-changes")
      .option("path", feed.toString)
      .option("maxChangesPerTrigger", "12")
      .load()
      .writeStream
      .queryName("bms-stream")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch(BucketedMergeSink.forBatch(root, buckets = 4))
      .start()
    q.awaitTermination()
    // 10 distinct ids, latest rev each
    val st = BucketedMergeSink.readState(spark, root)
    assert(st.count() == 10)
    assert(st.filter($"id" === "d9").collect().head.getString(1).startsWith("2-") ||
      st.filter($"id" === "d9").collect().head.getString(1).startsWith("3-"))
  }
}
