package graft.streaming

import java.nio.file.Files

import graft.SparkSpec

class EventLogSpec extends SparkSpec {

  test("listener observes connect / change.success / checkpoint (T9)") {
    val log = new EventLog
    spark.streams.addListener(log)
    try {
      val feed = Files.createTempDirectory("evlog-feed")
      Files.write(feed.resolve("f.jsonl"),
        (1 to 5).map(i =>
          s"""{"seq":$i,"id":"d$i","changes":[{"rev":"1-a"}],"doc":{"n":$i}}""")
          .mkString("\n").getBytes("UTF-8"))
      ChangesPipeline.runOnce(spark, feed.toString,
        Files.createTempDirectory("evlog-store").toString,
        Files.createTempDirectory("evlog-ckpt").toString,
        name = "evlog-feed")
      // listener bus is async; wait for delivery
      val deadline = System.currentTimeMillis() + 15000
      def events = log.forQuery("evlog-feed").map(_.event)
      while (!(events.contains("connect") && events.contains("checkpoint")) &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(events.contains("connect"))
      assert(events.contains("change.success"))
      assert(events.contains("checkpoint"))
      val ck = log.forQuery("evlog-feed").find(_.event == "checkpoint").get
      assert(ck.detail.contains("\"seq\":5"))
    } finally spark.streams.removeListener(log)
  }
}
