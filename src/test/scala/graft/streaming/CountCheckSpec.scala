package graft.streaming

import java.nio.file.Files

import graft.{CountCheck, SparkSpec}

class CountCheckSpec extends SparkSpec {

  private def line(seq: Long, id: String, deleted: Boolean = false): String = {
    val d = if (deleted) ""","deleted":true""" else ""
    s"""{"seq":$seq,"id":"$id","changes":[{"rev":"$seq-a"}]$d,"doc":{"n":$seq}}"""
  }

  test("OK after a full sync; WARNING on small drift; ERROR past threshold") {
    val feed = Files.createTempDirectory("cc-feed")
    val store = Files.createTempDirectory("cc-store").toString
    val ckpt = Files.createTempDirectory("cc-ckpt").toString
    Files.write(feed.resolve("a.jsonl"),
      ((1 to 10).map(i => line(i, s"d$i")) :+ line(11, "d1", deleted = true))
        .mkString("\n").getBytes("UTF-8"))

    ChangesPipeline.runOnce(spark, feed.toString, store, ckpt, "cc")
    val synced = CountCheck.check(spark, feed.toString, store)
    assert(synced.feedCount == 9 && synced.storeCount == 9)
    assert(CountCheck.verdict(synced, 10) == 0)

    // drift: 5 new docs not yet synced -> WARNING (<= threshold)
    Files.write(feed.resolve("b.jsonl"),
      (12 to 16).map(i => line(i, s"x$i")).mkString("\n").getBytes("UTF-8"))
    val drifted = CountCheck.check(spark, feed.toString, store)
    assert(drifted.difference == 5)
    assert(CountCheck.verdict(drifted, 10) == 1)

    // beyond the threshold -> ERROR (nagios exit 2)
    Files.write(feed.resolve("c.jsonl"),
      (17 to 30).map(i => line(i, s"y$i")).mkString("\n").getBytes("UTF-8"))
    val broken = CountCheck.check(spark, feed.toString, store)
    assert(broken.difference == 19)
    assert(CountCheck.verdict(broken, 10) == 2)

    // resync converges back to OK
    ChangesPipeline.runOnce(spark, feed.toString, store, ckpt, "cc2")
    assert(CountCheck.verdict(
      CountCheck.check(spark, feed.toString, store), 10) == 0)
  }

  test("HTTP feed answers from the server's doc_count") {
    val couch = new StubCouch("db1")
    val port = couch.start()
    try {
      (1 to 4).foreach(i =>
        couch.changes += couch.Chg(i, s"d$i", "1-a", doc = s"""{"n":$i}"""))
      couch.changes += couch.Chg(5, "d4", "2-a", deleted = true)
      val store = Files.createTempDirectory("cc-http-store").toString
      val r = CountCheck.check(
        spark, s"http://127.0.0.1:$port/db1", store)
      assert(r.feedCount == 3) // d4 deleted
      assert(r.storeCount == 0)
      assert(CountCheck.verdict(r, 10) == 1)
    } finally couch.stop()
  }
}
