package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, Trigger}

import graft.SparkSpec
import graft.cdc.ChangeEvent

/** Stateful streaming specs: echo suppression across micro-batches and
  * watermarked windowed aggregation, driven by MemoryStream (the
  * SURVEY §5 chaos-walkthrough simulations).
  */
class StatefulOpsSpec extends SparkSpec {

  private def ev(seq: Long, id: String, rev: String,
      deleted: Boolean = false): ChangeEvent =
    ChangeEvent(seq, id, rev, deleted, if (deleted) null else s"""{"r":"$rev"}""")

  test("suppressGroup: echoes NOOP, rev changes pass, deletes need presence") {
    // fresh insert then echo of same rev -> one emit
    val s1 = new TestGroupState[String](None)
    val out1 = StatefulOps.suppressGroup("a",
      Iterator(ev(1, "a", "1-x"), ev(2, "a", "1-x")), s1).toSeq
    assert(out1.map(_.seq) == Seq(1L))
    assert(s1.value.contains("1-x"))

    // update with new rev passes; duplicate of it suppressed
    val out2 = StatefulOps.suppressGroup("a",
      Iterator(ev(3, "a", "2-y"), ev(4, "a", "2-y")), s1).toSeq
    assert(out2.map(_.seq) == Seq(3L))

    // delete emits once; second delete of absent doc suppressed
    val out3 = StatefulOps.suppressGroup("a",
      Iterator(ev(5, "a", "3-z", deleted = true),
        ev(6, "a", "3-z", deleted = true)), s1).toSeq
    assert(out3.map(_.seq) == Seq(5L))
    assert(s1.removed)

    // out-of-order arrival within a batch is reordered by seq
    val s2 = new TestGroupState[String](None)
    val out4 = StatefulOps.suppressGroup("b",
      Iterator(ev(9, "b", "2-n"), ev(8, "b", "1-m")), s2).toSeq
    assert(out4.map(_.rev) == Seq("1-m", "2-n"))
  }

  test("echoSuppress end-to-end: write-back echo converges (T10)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[ChangeEvent]
    val suppressed = StatefulOps.echoSuppress(input.toDS())
    val ckpt = Files.createTempDirectory("t10").toString
    val q = suppressed.writeStream
      .format("memory").queryName("t10_out")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime("50 milliseconds"))
      .start()
    try {
      // batch 1: original write
      input.addData(ev(1, "d1", "1-a"))
      q.processAllAvailable()
      // batch 2: the write-back echo (same rev) + a real update
      input.addData(ev(2, "d1", "1-a"), ev(3, "d1", "2-b"))
      q.processAllAvailable()
      val got = spark.sql("SELECT seq FROM t10_out ORDER BY seq")
        .collect().map(_.getLong(0)).toSeq
      assert(got == Seq(1L, 3L)) // echo seq=2 suppressed across batches
    } finally q.stop()
  }

  test("dedupByContent: first copy of each content survives across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[ChangeEvent]
    val deduped = StatefulOps.dedupByContent(input.toDF())
    val ckpt = Files.createTempDirectory("dedup").toString
    val q = deduped.writeStream
      .format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", ckpt)
      .start()
    try {
      input.addData(
        ChangeEvent(1, "a", "1-x", false, """{"t":"same"}"""),
        ChangeEvent(2, "b", "1-y", false, """{"t":"same"}"""),
        ChangeEvent(3, "c", "1-z", false, """{"t":"other"}"""))
      q.processAllAvailable()
      // later batch: another copy of "same" under a new id -> dropped
      input.addData(ChangeEvent(4, "d", "1-w", false, """{"t":"same"}"""))
      q.processAllAvailable()
      val got = spark.sql("SELECT seq FROM dedup_out ORDER BY seq")
        .collect().map(_.getLong(0)).toSeq
      assert(got == Seq(1L, 3L)) // seq 2 (intra-batch) and 4 (cross-batch) deduped
    } finally q.stop()
  }

  test("windowedRates: watermark drops data later than the delay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = input.toDF().toDF("ts", "event_type", "value")
    val ckpt = Files.createTempDirectory("win").toString
    val q = StatefulOps.windowedRates(df, delay = "10 minutes",
      windowLen = "10 minutes")
      .writeStream.format("memory").queryName("win_out")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", ckpt)
      .start()
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")
    try {
      input.addData((ts(0), "click", 1.0), (ts(5), "click", 2.0))
      q.processAllAvailable()
      // advance event time far past the first window + watermark
      input.addData((ts(40), "click", 4.0))
      q.processAllAvailable()
      // a straggler for the long-closed first window: dropped
      input.addData((ts(1), "click", 99.0))
      q.processAllAvailable()
      input.addData((ts(59), "view", 1.0))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT window_start, n_events, total_value FROM win_out ORDER BY window_start")
        .collect()
      // the finalized 10:00 window has exactly the 2 on-time events
      assert(rows.nonEmpty)
      val first = rows.head
      assert(first.getTimestamp(0) == ts(0))
      assert(first.getLong(1) == 2L)
      assert(first.getDouble(2) == 3.0)
    } finally q.stop()
  }

  test("slidingCounts: overlapping windows equal the batch twin; topTrending ranks") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val df = input.toDF().toDF("ts", "event_type")
    val ckpt = Files.createTempDirectory("slide").toString
    // complete mode: every (window, type) count visible without
    // watermark passage — lets us compare against the batch plan exactly
    val q = StatefulOps.slidingCounts(df,
      windowLen = "10 minutes", slide = "5 minutes")
      .writeStream.format("memory").queryName("slide_out")
      .outputMode(OutputMode.Complete)
      .option("checkpointLocation", ckpt)
      .start()
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")
    val data = Seq((ts(1), "click"), (ts(4), "view"), (ts(6), "click"),
      (ts(6), "click"), (ts(11), "view"))
    try {
      input.addData(data.take(3))
      q.processAllAvailable()
      input.addData(data.drop(3))
      q.processAllAvailable()
      val got = spark.sql(
        "SELECT window_start, event_type, n_events FROM slide_out")
        .as[(java.sql.Timestamp, String, Long)].collect().toSet
      // batch twin: identical grouping expression over the same rows
      val batch = data.toDF("ts", "event_type")
        .groupBy(window($"ts", "10 minutes", "5 minutes"), $"event_type")
        .agg(count(lit(1)).as("n_events"))
        .select($"window.start", $"event_type", $"n_events")
        .as[(java.sql.Timestamp, String, Long)].collect().toSet
      assert(got == batch)
      // each event lands in exactly windowLen/slide = 2 windows
      assert(got.toSeq.map(_._3).sum == data.size * 2)
      // trending: the [10:00,10:10) window ranks click(3) over view(1)
      val top = StatefulOps.topTrending(
        spark.sql("SELECT * FROM slide_out"), k = 1)
        .where($"window_start" === ts(0))
        .select($"event_type", $"n_events").as[(String, Long)].collect()
      assert(top.toSeq == Seq(("click", 3L)))
    } finally q.stop()
  }

  test("viewsBeforePurchase: stream-stream interval join matches the batch twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val vIn = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val pIn = MemoryStream[(Long, Long, java.sql.Timestamp)]
    def df(m: MemoryStream[(Long, Long, java.sql.Timestamp)]) =
      m.toDF().toDF("event_id", "user_id", "ts")
    val ckpt = Files.createTempDirectory("ssj").toString
    val q = StatefulOps.viewsBeforePurchase(df(vIn), df(pIn),
      delay = "10 minutes", window = "30 minutes")
      .writeStream.format("memory").queryName("ssj_out")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", ckpt)
      .start()
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")
    // user 7: views at 10:00, 10:20, purchase at 10:25 (both views in
    // window); view at 10:25 is NOT before the purchase; user 8's view
    // must not match user 7's purchase
    val views = Seq((1L, 7L, ts(0)), (2L, 7L, ts(20)), (3L, 7L, ts(25)),
      (4L, 8L, ts(24)))
    val purchases = Seq((10L, 7L, ts(25)))
    try {
      vIn.addData(views.take(2))
      q.processAllAvailable()
      pIn.addData(purchases)
      vIn.addData(views.drop(2))
      q.processAllAvailable()
      val got = spark.sql("SELECT purchase_id, view_id FROM ssj_out")
        .as[(Long, Long)].collect().toSet
      val batch = StatefulOps.viewsBeforePurchase(
        views.toDF("event_id", "user_id", "ts"),
        purchases.toDF("event_id", "user_id", "ts"),
        window = "30 minutes")
        .select($"purchase_id", $"view_id").as[(Long, Long)].collect().toSet
      assert(got == Set((10L, 1L), (10L, 2L)))
      assert(got == batch)
    } finally q.stop()
  }

  test("stream-static enrichment: dimension broadcast-joins onto the stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val dim = Seq(("click", "engagement"), ("view", "impression"))
      .toDF("event_type", "category")
    val enriched = input.toDF().toDF("event_id", "event_type")
      .join(org.apache.spark.sql.functions.broadcast(dim), "event_type")
    val ckpt = Files.createTempDirectory("enrich").toString
    val q = enriched.writeStream.format("memory").queryName("enrich_out")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", ckpt)
      .start()
    try {
      input.addData((1L, "click"), (2L, "view"), (3L, "unknown"))
      q.processAllAvailable()
      val got = spark.sql(
        "SELECT event_id, category FROM enrich_out ORDER BY event_id")
        .as[(Long, String)].collect().toSeq
      // inner join drops the unmapped type; the dimension is static —
      // a stream-static join runs stateless (no state store), re-joining
      // each micro-batch against the broadcast table
      assert(got == Seq(1L -> "engagement", 2L -> "impression"))
      assert(q.lastProgress.stateOperators.isEmpty ||
        q.lastProgress.stateOperators.forall(_.numRowsTotal == 0))
    } finally q.stop()
  }

  test("bucketGroup: best match, same-batch dup, FIFO cap") {
    def sig(e: SigEvent) = e
    // same batch: b arrives after a with identical sig -> caught
    val s1 = new TestGroupState[BucketState](None)
    val out1 = StatefulOps.bucketGroup(maxHamming = 2, cap = 10)((0, 7),
      Iterator(SigEvent("a", 1, 0x0F0FL, 0, 7),
        SigEvent("b", 2, 0x0F0FL, 0, 7)), s1).toSeq
    assert(out1 == Seq(NearDupHit("b", 2, "a", 0)))

    // later batch: c within hamming 1 of both -> best = min id among ties?
    // a and b have identical sigs, so hamming ties at 1; min id "a" wins
    val out2 = StatefulOps.bucketGroup(maxHamming = 2, cap = 10)((0, 7),
      Iterator(SigEvent("c", 3, 0x0F0EL, 0, 7)), s1).toSeq
    assert(out2 == Seq(NearDupHit("c", 3, "a", 1)))

    // far signature: no hit, but still appended to state
    val out3 = StatefulOps.bucketGroup(maxHamming = 2, cap = 10)((0, 7),
      Iterator(SigEvent("d", 4, 0x7777000000000000L, 0, 7)), s1).toSeq
    assert(out3.isEmpty)
    assert(s1.value.get.ids.toSeq == Seq("a", "b", "c", "d"))

    // FIFO cap evicts the oldest entry
    val s2 = new TestGroupState[BucketState](None)
    StatefulOps.bucketGroup(maxHamming = 0, cap = 2)((0, 1),
      Iterator(SigEvent("x", 1, 1L, 0, 1), SigEvent("y", 2, 2L, 0, 1),
        SigEvent("z", 3, 4L, 0, 1)), s2).toSeq
    assert(s2.value.get.ids.toSeq == Seq("y", "z"))
  }

  test("nearDupCandidates end-to-end: dup across micro-batches detected") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, String)]
    val docs = input.toDF().toDF("id", "seq", "doc")
    val hits = StatefulOps.nearDupCandidates(docs)
    val ckpt = Files.createTempDirectory("ndup").toString
    val q = hits.writeStream.format("memory").queryName("ndup_out")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", ckpt)
      .start()
    // long doc: one changed word perturbs few simhash bits (a short
    // doc's majority votes are fragile — single-word edits flip many)
    val text = (0 until 5).map(i =>
      s"w$i common filler token text data spark stream batch row")
      .mkString(" ")
    try {
      input.addData(("orig", 1L, text),
        ("other", 2L, "completely different words about streaming state"))
      q.processAllAvailable()
      // near-identical doc in a LATER batch: one word changed
      input.addData(("dup", 3L, text.replace("w0", "q0")))
      q.processAllAvailable()
      val resolved = StatefulOps.resolveNearDups(
        spark.table("ndup_out")).collect()
      assert(resolved.length == 1)
      val r = resolved.head
      assert(r.getString(0) == "dup" && r.getString(1) == "orig")
      // exact re-send of the original: hamming 0
      input.addData(("copy", 4L, text))
      q.processAllAvailable()
      val all = StatefulOps.resolveNearDups(
        spark.table("ndup_out")).collect()
        .map(r => r.getString(0) -> (r.getString(1), r.getInt(2))).toMap
      assert(all("copy") == ("orig", 0))
    } finally q.stop()
  }

  test("streaming near-dup set equals batch simhashPairs, any batch split") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // corpus with exact copies, near-copies, and unrelated docs
    val base = (0 until 4).map(i =>
      s"b$i alpha beta gamma delta epsilon zeta eta theta iota kappa " +
        "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi")
    val docs: Seq[(String, Long, String)] = (0 until 24).map { i =>
      val text = i % 4 match {
        case 0 => base(i % base.length)                      // copies
        case 1 => base(i % base.length).replace("mu", s"m$i") // near
        case _ => s"unique doc $i " + (0 until 20)
          .map(j => s"w${i * 31 + j}").mkString(" ")          // unrelated
      }
      (f"d$i%02d", i.toLong, text)
    }
    // batch truth: every doc with a simhash pair to an EARLIER doc
    val expected = graft.pipeline.Dedup.simhashPairs(
      docs.toDF("id", "seq", "doc"), "id", "doc",
      maxHamming = 8, chunks = 4)
      .collect()
      .map(r => if (r.getString(0) < r.getString(1)) r.getString(1)
                else r.getString(0))
      .toSet
    // streaming, split into 3 uneven micro-batches
    val input = MemoryStream[(String, Long, String)]
    val hits = StatefulOps.nearDupCandidates(
      input.toDF().toDF("id", "seq", "doc"))
    val ckpt = Files.createTempDirectory("ndeq").toString
    val q = hits.writeStream.format("memory").queryName("ndeq_out")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", ckpt)
      .start()
    try {
      input.addData(docs.take(5))
      q.processAllAvailable()
      input.addData(docs.slice(5, 6))
      q.processAllAvailable()
      input.addData(docs.drop(6))
      q.processAllAvailable()
      val detected = StatefulOps.resolveNearDups(spark.table("ndeq_out"))
        .collect().map(_.getString(0)).toSet
      // identical candidate generation (chunk collision) + identical
      // verification (hamming <= 8): the detected set must match exactly
      assert(detected == expected,
        s"streaming=$detected batch=$expected")
      assert(expected.nonEmpty) // the corpus genuinely contains dups
    } finally q.stop()
  }

  test("histBinCounts: streaming bin counts accumulate; quantile estimates track") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Long]
    val df = input.toDF().toDF("v")
    val ckpt = Files.createTempDirectory("hist").toString
    // grid: [0, 1000) in 10 bins of width 100; outliers clamp to the edges
    val q = StatefulOps.histBinCounts(df, "v", lo = 0L, width = 100L, bins = 10)
      .writeStream.format("memory").queryName("hist_out")
      .outputMode(OutputMode.Complete)
      .option("checkpointLocation", ckpt)
      .start()
    try {
      input.addData(1L to 500L: _*)
      q.processAllAvailable()
      val bins1 = spark.table("hist_out")
      // 1..99 land in bin 0, each full bin holds 100, value 500 opens bin 5
      val m1 = bins1.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(m1(0L) == 99L && m1(4L) == 100L && m1(5L) == 1L)
      val est1 = StatefulOps.quantilesFromBins(bins1, 0L, 100L, Seq(500, 900))
        .collect().head
      assert(est1.getAs[Long]("n") == 500L)
      // exact p50=250 -> bin 2, edge 299; p90=450 -> bin 4, edge 499
      assert(est1.getAs[Long]("p500_est") == 299L)
      assert(est1.getAs[Long]("p900_est") == 499L)

      // second batch shifts the distribution up; counts must accumulate
      input.addData(501L to 1000L: _*)
      input.addData(-50L, 5000L) // outliers clamp into bins 0 and 9
      q.processAllAvailable()
      val bins2 = spark.table("hist_out")
      val m2 = bins2.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(m2(0L) == 100L) // 99 in-grid + 1 clamped below
      assert(m2(9L) == 102L) // 900-999 + value 1000 clamped + 5000 clamped
      val est2 = StatefulOps.quantilesFromBins(bins2, 0L, 100L, Seq(500, 900))
        .collect().head
      assert(est2.getAs[Long]("n") == 1002L)
      // median moved up a full grid half: bin 5 edge
      assert(est2.getAs[Long]("p500_est") == 599L)
    } finally q.stop()
  }
}

/** Minimal GroupState for unit-testing the fold outside a stream. */
final class TestGroupState[T](initial: Option[T])
    extends org.apache.spark.sql.streaming.GroupState[T] {
  private var v: Option[T] = initial
  var removed: Boolean = false
  def value: Option[T] = v
  override def exists: Boolean = v.isDefined
  override def get: T = v.get
  override def getOption: Option[T] = v
  override def update(newValue: T): Unit = { v = Some(newValue); removed = false }
  override def remove(): Unit = { v = None; removed = true }
  override def hasTimedOut: Boolean = false
  override def setTimeoutDuration(durationMs: Long): Unit = ()
  override def setTimeoutDuration(duration: String): Unit = ()
  override def setTimeoutTimestamp(timestampMs: Long): Unit = ()
  override def setTimeoutTimestamp(timestampMs: Long, additionalDuration: String): Unit = ()
  override def setTimeoutTimestamp(timestamp: java.sql.Date): Unit = ()
  override def setTimeoutTimestamp(timestamp: java.sql.Date, additionalDuration: String): Unit = ()
  override def getCurrentWatermarkMs(): Long = 0L
  override def getCurrentProcessingTimeMs(): Long = 0L
}
