package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

class BackoffSpec extends SparkSpec {

  test("RestartBackoff: exponential growth capped at max") {
    val b = RestartBackoff(10000L, 60000L)
    assert(b.delayMs(0) == 0L)
    assert(b.delayMs(1) == 10000L)
    assert(b.delayMs(2) == 20000L)
    assert(b.delayMs(3) == 40000L)
    assert(b.delayMs(4) == 60000L) // capped
    assert(b.delayMs(100) == 60000L)
  }

  test("feed that fails to start backs off, doesn't kill the finder (T6)") {
    var now = 0L
    val sup = new Supervisor(spark,
      trigger = Trigger.AvailableNow(),
      backoff = RestartBackoff(10000L, 60000L),
      clock = () => now)
    // checkpoint parent is a FILE -> query start throws synchronously
    val badCkpt = Files.createTempFile("ckpt-file", ".notadir")
    val bad = FeedConfig(
      name = "bad-feed",
      feedPath = Files.createTempDirectory("empty-feed").toString,
      storeRoot = Files.createTempDirectory("store").toString,
      checkpoint = badCkpt.toString + "/sub")
    val okDir = Files.createTempDirectory("ok-feed")
    Files.write(okDir.resolve("f.jsonl"),
      """{"seq":1,"id":"x","changes":[{"rev":"1-a"}],"doc":{}}""".getBytes)
    val ok = FeedConfig(
      name = "ok-feed",
      feedPath = okDir.toString,
      storeRoot = Files.createTempDirectory("store-ok").toString,
      checkpoint = Files.createTempDirectory("ckpt-ok").toString)
    try {
      // the healthy feed starts even though the bad one throws
      val (s1, _) = sup.reconcile(Seq(bad, ok))
      assert(s1 == Seq("ok_feed"))
      assert(sup.failureCounts.get("bad_feed").contains(1))

      // inside the 10 s backoff: no retry, count unchanged
      now = 2000L
      sup.reconcile(Seq(bad, ok))
      assert(sup.failureCounts.get("bad_feed").contains(1))

      // past the backoff: retry attempted (fails again -> count 2)
      now = 12000L
      sup.reconcile(Seq(bad, ok))
      assert(sup.failureCounts.get("bad_feed").contains(2))

      // next backoff doubled to 20 s: no attempt at +12 s
      now = 22000L
      sup.reconcile(Seq(bad, ok))
      assert(sup.failureCounts.get("bad_feed").contains(2))
    } finally sup.stopAll()
  }
}
