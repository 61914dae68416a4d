package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** Chaos-script parity with the reference daemon's documented walks
  * (daemon-README.md:47-301): the add → disable → re-enable lifecycle,
  * "what if postgres dies", and "what happens if couchdb dies" — each
  * as one integration scenario over [[Supervisor.reconcile]] +
  * [[StatusServer]], with the status JSON asserted against the
  * documented field shape (daemon-README.md:107-113).
  */
class DaemonChaosSpec extends SparkSpec {

  private val fastTrigger = Trigger.ProcessingTime("100 milliseconds")
  private val noBackoff = RestartBackoff(1L, 2L) // retry due ~immediately

  private def writeFeed(dir: java.nio.file.Path, file: String, name: String,
      seqs: Range): Unit =
    Files.write(dir.resolve(file), seqs.map(i =>
      s"""{"seq":$i,"id":"$name-$i","changes":[{"rev":"1-a"}],"doc":{"n":$i}}""")
      .mkString("\n").getBytes("UTF-8"))

  private def await(deadlineMs: Long = 30000L)(cond: => Boolean): Boolean = {
    val end = System.currentTimeMillis() + deadlineMs
    var ok = cond
    while (!ok && System.currentTimeMillis() < end) {
      Thread.sleep(200); ok = cond
    }
    ok
  }

  private def httpGet(url: String): String = {
    val c = java.net.http.HttpClient.newHttpClient()
    c.send(java.net.http.HttpRequest.newBuilder(
      java.net.URI.create(url)).GET().build(),
      java.net.http.HttpResponse.BodyHandlers.ofString()).body()
  }

  test("walk 1: add -> follow -> disable -> reap -> re-enable resumes (daemon-README.md:47-183)") {
    val sup = new Supervisor(spark, trigger = fastTrigger, backoff = noBackoff)
    val feedDir = Files.createTempDirectory("chaos1-feed")
    writeFeed(feedDir, "a.jsonl", "doc", 1 to 5)
    val cfg = FeedConfig(
      name = "articles-pg", // mangles to articles_pg like the daemon
      feedPath = feedDir.toString,
      storeRoot = Files.createTempDirectory("chaos1-store").toString,
      checkpoint = Files.createTempDirectory("chaos1-ckpt").toString)
    val registry = new java.util.concurrent.atomic.AtomicReference(Seq.empty[FeedConfig])
    val srv = new StatusServer(sup, () => registry.get(),
      checkpoints = () => Map("articles_pg" -> cfg.checkpoint), port = 0)
    try {
      val port = srv.start()
      def get(p: String) = httpGet(s"http://127.0.0.1:$port$p")
      // empty registry: the daemon shows [] (daemon-README.md:42-44)
      assert(get("/_status") == "[]")
      // "INSERT INTO since_checkpoints ... enabled=true" then /_finder
      registry.set(Seq(cfg))
      assert(get("/_finder") == """{"started":["articles_pg"],"stopped":[]}""")
      assert(await() {
        MergeSink.readState(spark, cfg.storeRoot).count() == 5L
      })
      // /_status: the documented per-feed JSON shape (daemon-README:107-113)
      val st = get("/_status")
      for (field <- Seq(""""feed":"articles_pg"""", """"alive":true""",
          """"status":""", """"since":""", """"since_checkpoint":"""))
        assert(st.contains(field), s"missing $field in $st")
      // "UPDATE since_checkpoints SET enabled=false" then the watchdog
      registry.set(Seq(cfg.copy(enabled = false)))
      assert(get("/_finder") == """{"started":[],"stopped":["articles_pg"]}""")
      assert(get("/_status") == "[]") // reaped: gone from status
      // re-enable: the finder restarts it from the checkpoint; new
      // changes arrive, old ones replay as NOOPs (exactly-once)
      writeFeed(feedDir, "b.jsonl", "doc", 6 to 8)
      registry.set(Seq(cfg))
      assert(get("/_finder") == """{"started":["articles_pg"],"stopped":[]}""")
      assert(await() {
        MergeSink.readState(spark, cfg.storeRoot).count() == 8L
      })
      val ids = MergeSink.readState(spark, cfg.storeRoot)
        .select("id").collect().map(_.getString(0)).toSeq
      assert(ids.distinct.size == 8) // no duplicates after the round trip
    } finally { srv.stop(); sup.stopAll() }
  }

  test("walk 2: the store dies -> feed reaped as transient -> recovers on reconnect (daemon-README.md:185-246)") {
    val sup = new Supervisor(spark, trigger = fastTrigger, backoff = noBackoff)
    val feedDir = Files.createTempDirectory("chaos2-feed")
    writeFeed(feedDir, "a.jsonl", "doc", 1 to 6)
    // the "postgres" analog is the parquet doc store: plant a regular
    // FILE where the store directory must go, so every batch write dies
    val storeParent = Files.createTempDirectory("chaos2")
    val storePath = storeParent.resolve("store")
    Files.write(storePath, "not a directory".getBytes("UTF-8"))
    val cfg = FeedConfig(
      name = "pgdeath",
      feedPath = feedDir.toString,
      storeRoot = storePath.toString,
      checkpoint = Files.createTempDirectory("chaos2-ckpt").toString)
    try {
      sup.reconcile(Seq(cfg))
      // the query dies on its first batch; the watchdog pass must
      // classify it TRANSIENT (backoff), never fatal-halt — postgres
      // death is retryable (daemon: "terminate feeds, reconnect, bring
      // the feeds back up")
      assert(await() { sup.reconcile(Seq(cfg)); sup.failureCounts.getOrElse("pgdeath", 0) >= 1 })
      assert(sup.haltedFeeds.isEmpty, s"store death must not halt: ${sup.haltedFeeds}")
      // "postgres" comes back: replace the file with nothing (MergeSink
      // creates its own directories) and let the finder restart the feed
      Files.delete(storePath)
      assert(await() {
        sup.reconcile(Seq(cfg))
        scala.util.Try(MergeSink.readState(spark, cfg.storeRoot).count())
          .getOrElse(0L) == 6L
      })
      assert(sup.activeFeeds == Set("pgdeath"))
      assert(sup.failureCounts.getOrElse("pgdeath", 0) == 0) // cleared on health
    } finally sup.stopAll()
  }

  test("walk 3: couch dies mid-follow -> transient backoff -> reconnect resumes exactly-once (daemon-README.md:248-301)") {
    val sup = new Supervisor(spark, trigger = fastTrigger, backoff = noBackoff)
    def lines(n: Int) = (1 to n).map(i =>
      s"""{"seq":$i,"id":"d$i","changes":[{"rev":"1-a"}],"doc":{"n":$i}}""")
    val stub1 = new CouchStubServer("cdb", lines(10))
    val port = stub1.start()
    val cfg = FeedConfig(
      name = "couchdeath",
      feedPath = s"http://127.0.0.1:$port/cdb",
      storeRoot = Files.createTempDirectory("chaos3-store").toString,
      checkpoint = Files.createTempDirectory("chaos3-ckpt").toString)
    try {
      sup.reconcile(Seq(cfg))
      assert(await() {
        MergeSink.readState(spark, cfg.storeRoot).count() == 10L
      })
      // couch dies (ECONNREFUSED in the reference walk)
      stub1.stop()
      assert(await() {
        sup.reconcile(Seq(cfg))
        !sup.activeFeeds.contains("couchdeath") &&
          sup.failureCounts.getOrElse("couchdeath", 0) >= 1
      })
      assert(sup.haltedFeeds.isEmpty,
        s"connection refused must back off, not halt: ${sup.haltedFeeds}")
      // couch comes back at the SAME address with new changes; the
      // finder restarts the feed and it resumes from the checkpoint
      val stub2 = new CouchStubServer("cdb", lines(14), port = port)
      val bound = await(10000L) {
        scala.util.Try(stub2.start()).isSuccess
      }
      assert(bound, s"could not rebind stub on port $port")
      try {
        assert(await() {
          sup.reconcile(Seq(cfg))
          MergeSink.readState(spark, cfg.storeRoot).count() == 14L
        })
        val ids = MergeSink.readState(spark, cfg.storeRoot)
          .select("id").collect().map(_.getString(0)).toSeq
        assert(ids.distinct.size == 14) // resumed, not re-ingested
        // the resume request asked for a non-zero since (checkpointed)
        assert(stub2.changesSinceLog.toArray.toSeq
          .exists(s => s.asInstanceOf[Long] >= 10L),
          s"expected a since>=10 resume request, got ${stub2.changesSinceLog}")
      } finally stub2.stop()
    } finally sup.stopAll()
  }

  test("walk 4: a supervised Index feed builds the retrieval plane next to a Store feed") {
    val sup = new Supervisor(spark, trigger = fastTrigger, backoff = noBackoff)
    val feedDir = Files.createTempDirectory("chaos4-feed")
    Files.write(feedDir.resolve("a.jsonl"), (1 to 6).map(i =>
      s"""{"seq":$i,"id":"$i","changes":[{"rev":"1-a"}],"doc":{"text":"spark merge w$i"}}""")
      .mkString("\n").getBytes("UTF-8"))
    val store = FeedConfig("texts-pg", feedDir.toString,
      Files.createTempDirectory("chaos4-store").toString,
      Files.createTempDirectory("chaos4-ck1").toString)
    val idxRoot = Files.createTempDirectory("chaos4-idx").toString + "/idx"
    val index = FeedConfig("texts-idx", feedDir.toString, idxRoot,
      Files.createTempDirectory("chaos4-ck2").toString,
      sink = FeedSink.Index(nBuckets = 8))
    try {
      val (started, _) = sup.reconcile(Seq(store, index))
      assert(started == Seq("texts_idx", "texts_pg"))
      // both planes converge from the same feed: the doc store holds
      // the merged docs, the index answers BM25 over their text
      assert(await() {
        MergeSink.readState(spark, store.storeRoot).count() == 6L &&
          InvertedIndexSink.appliedBatches(idxRoot).nonEmpty
      })
      assert(await() {
        !sup.activeFeeds.contains("texts_idx") || {
          val got = graft.pipeline.Retrieval.probeTopK(spark, idxRoot,
            Seq(1L -> "spark"), k = 10, nBuckets = 8).count()
          got == 6L
        }
      })
      val got = graft.pipeline.Retrieval.probeTopK(spark, idxRoot,
        Seq(1L -> "spark"), k = 10, nBuckets = 8)
        .collect().map(_.getLong(2)).toSet
      assert(got == (1L to 6L).toSet, s"index missing docs: $got")
    } finally sup.stopAll()
  }
}
