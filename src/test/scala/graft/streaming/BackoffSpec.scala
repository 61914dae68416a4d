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

  test("JitteredBackoff spreads delays in [min,max) and is stable per attempt") {
    val b = JitteredBackoff(10000L, 60000L, seed = 42L)
    assert(b.delayMs("f", 0) == 0L)
    val delays = (1 to 50).map(i => b.delayMs("feed-a", i))
    assert(delays.forall(d => d >= 10000L && d < 60000L))
    assert(delays.distinct.size > 10) // actually spread, not constant
    // stable: the due-time must not flap between reconcile passes
    assert(b.delayMs("feed-a", 3) == b.delayMs("feed-a", 3))
    // desynchronized across feeds at the same failure count (the whole
    // point of the reference's randomization, lib/index.js:225-229)
    val across = (1 to 20).map(i => b.delayMs(s"feed-$i", 1))
    assert(across.distinct.size > 10)
  }

  test("fatal feed error halts the feed; transient backs off (lib/index.js:205-230)") {
    val couch = new StubCouch("realdb")
    val port = couch.start()
    try {
      val sup = new Supervisor(spark, trigger = Trigger.AvailableNow())
      def cfg(name: String, url: String) = FeedConfig(
        name = name,
        feedPath = url,
        storeRoot = Files.createTempDirectory(s"store-$name").toString,
        checkpoint = Files.createTempDirectory(s"ckpt-$name").toString)
      // 404 db -> FeedGoneException (no_db_file class) -> halt
      val gone = cfg("gone-feed", s"http://127.0.0.1:$port/nope")
      // connection refused -> transient -> backoff queue
      val down = cfg("down-feed", "http://127.0.0.1:1/db")
      try {
        sup.reconcile(Seq(gone, down))
        val deadline = System.currentTimeMillis() + 30000
        while (sup.activeFeeds.nonEmpty && System.currentTimeMillis() < deadline)
          Thread.sleep(100)
        sup.watchdog()
        assert(sup.haltedFeeds.keySet == Set("gone_feed"))
        assert(sup.haltedFeeds("gone_feed").contains("no_db_file") ||
          sup.haltedFeeds("gone_feed").contains("not found"))
        assert(sup.failureCounts.get("down_feed").exists(_ >= 1))
        // halted feeds are NOT restarted by the finder
        val (restarted, _) = sup.reconcile(Seq(gone))
        assert(restarted.isEmpty)
        // disabling clears the halt; re-enabling starts fresh
        sup.reconcile(Seq(gone.copy(enabled = false)))
        assert(sup.haltedFeeds.isEmpty)
      } finally sup.stopAll()
    } finally couch.stop()
  }
}
