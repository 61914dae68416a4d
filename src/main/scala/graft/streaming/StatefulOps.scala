package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.cdc.ChangeEvent
import graft.pipeline.TextOps

/** One doc's signature landing in one LSH bucket (streaming near-dup). */
final case class SigEvent(
    id: String, seq: Long, sig: Long, chunkId: Int, chunkVal: Int)

/** A near-dup detection: doc `id` matches earlier doc `dupOf`. */
final case class NearDupHit(id: String, seq: Long, dupOf: String, hamming: Int)

/** Per-bucket state: signatures previously seen in this LSH bucket
  * (parallel arrays — compact in the state store). */
final case class BucketState(ids: Array[String], sigs: Array[Long])

/** Stateful streaming operators over the change feed.
  *
  * The reference checks idempotence by SELECTing the sink's current rev
  * before every write (reference lib/index.js:99-128) — one read per
  * change. Streaming-native design: the last-seen rev lives in Spark's
  * keyed state store, partitioned by doc id, so echo suppression (T10)
  * happens in-stream with zero sink reads. At 1000 executors the state
  * store shards with the keys; no coordination beyond the shuffle.
  */
object StatefulOps {

  /** Emit only EFFECTIVE changes: per doc id, drop events whose rev
    * equals the last emitted rev (write-back echoes, duplicate
    * deliveries) and deletes of absent docs. State = last live rev.
    *
    * flatMapGroupsWithState(Append, NoTimeout): CouchDB seqs have no
    * event-time, so state never expires (a real deployment bounds it
    * with a timeout matching the feed's compaction horizon).
    */
  def echoSuppress(changes: Dataset[ChangeEvent]): Dataset[ChangeEvent] = {
    import changes.sparkSession.implicits._
    changes
      .groupByKey(_.id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(suppressGroup)
  }

  /** Per-key fold, exposed for unit tests: events of one id (one
    * micro-batch), ordered by seq, against the stored last rev. */
  def suppressGroup(
      id: String,
      events: Iterator[ChangeEvent],
      state: GroupState[String]): Iterator[ChangeEvent] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[ChangeEvent]
    var last: Option[String] = state.getOption
    events.toSeq.sortBy(_.seq).foreach { e =>
      if (e.deleted) {
        if (last.isDefined) { out += e; last = None }
      } else if (!last.contains(e.rev)) {
        out += e
        last = Some(e.rev)
      }
    }
    last match {
      case Some(rev) => state.update(rev)
      case None => state.remove()
    }
    out.iterator
  }

  /** Streaming exact dedup by content — the ingest-plane twin of the
    * batch `Dedup.exactGroups` (p1): keep the FIRST document carrying
    * each content hash, drop every later copy. Keyed on md5(doc), so
    * state is one fixed-width hash per distinct document, sharded with
    * the shuffle like any keyed state.
    *
    * With an event-time column, `withWatermark` +
    * `dropDuplicatesWithinWatermark` bounds the state to the watermark
    * horizon (duplicates arriving within `delay` of each other are
    * caught; state older than the watermark is evicted). Without one
    * (CouchDB seqs carry no event time), `dropDuplicates` keeps state
    * forever — correct, but size it like the batch dedup table it
    * replaces. */
  def dedupByContent(
      changes: DataFrame,
      docCol: String = "doc",
      tsCol: Option[String] = None,
      delay: String = "1 hour"): DataFrame = {
    val hashed = changes.withColumn("content_hash", md5(col(docCol)))
    tsCol match {
      case Some(ts) => hashed.withWatermark(ts, delay)
        .dropDuplicatesWithinWatermark("content_hash")
      case None => hashed.dropDuplicates("content_hash")
    }
  }

  /** Streaming NEAR-dup detection — the ingest-plane twin of the batch
    * `Dedup.simhashPairs` (p4): as documents arrive, emit a hit for each
    * doc whose SimHash is within `maxHamming` of an EARLIER doc sharing
    * an LSH band (15-bit chunk; pigeonhole guarantees a collision when
    * hamming < chunks). Output is a candidate stream — up to `chunks`
    * hits per doc, one per colliding bucket; resolve the per-doc verdict
    * with [[resolveNearDups]] in the sink's foreachBatch.
    *
    * SCALE: state is keyed by (chunk, value) bucket and sharded with the
    * shuffle like any keyed state; each bucket stores only (id, sig)
    * pairs — 60-bit signatures, never text. `maxPerBucket` caps a hot
    * bucket FIFO-style (recall degrades to the newest `cap` docs in that
    * bucket — the standard online-LSH memory bound; at the default
    * banding a bucket holding >1024 mutually-non-dup docs means the
    * corpus outgrew the plane count, so raise `chunks`). CouchDB seqs
    * carry no event time, so state has no timeout; a real deployment
    * bounds it at the feed's compaction horizon like [[echoSuppress]].
    *
    * Within a micro-batch, events process in seq order, so a dup in the
    * same batch as its original IS caught (the original is appended to
    * the bucket before the dup is scanned). */
  def nearDupCandidates(
      docs: DataFrame, idCol: String = "id", seqCol: String = "seq",
      textCol: String = "doc", maxHamming: Int = 8, chunks: Int = 4,
      maxPerBucket: Int = 1024): Dataset[NearDupHit] = {
    import docs.sparkSession.implicits._
    require(maxHamming < chunks * 15, "banding cannot catch this distance")
    docs.select(
      col(idCol).cast("string").as("id"),
      col(seqCol).cast("long").as("seq"),
      TextOps.simhash(TextOps.tokens(col(textCol)), bits = 60).as("sig"))
      .select(col("id"), col("seq"), col("sig"),
        posexplode(array((0 until chunks).map(c =>
          shiftright(col("sig"), c * 15).bitwiseAND(32767).cast("int")): _*))
          .as(Seq("chunkId", "chunkVal")))
      .as[SigEvent]
      .groupByKey(e => (e.chunkId, e.chunkVal))
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        bucketGroup(maxHamming, maxPerBucket))
  }

  /** Per-bucket fold, exposed for unit tests: each event (seq order)
    * scans the stored signatures for its best match (min hamming, then
    * min id — deterministic), then appends itself (FIFO-capped). */
  def bucketGroup(maxHamming: Int, cap: Int)(
      key: (Int, Int),
      events: Iterator[SigEvent],
      state: GroupState[BucketState]): Iterator[NearDupHit] = {
    val st = state.getOption.getOrElse(
      BucketState(Array.empty, Array.empty))
    val ids = scala.collection.mutable.ArrayBuffer.from(st.ids)
    val sigs = scala.collection.mutable.ArrayBuffer.from(st.sigs)
    val out = scala.collection.mutable.ArrayBuffer.empty[NearDupHit]
    events.toSeq.sortBy(_.seq).foreach { e =>
      var bestH = maxHamming + 1
      var bestId: String = null
      var i = 0
      while (i < sigs.length) {
        val h = java.lang.Long.bitCount(sigs(i) ^ e.sig)
        if (h <= maxHamming &&
            (h < bestH || (h == bestH && ids(i) < bestId))) {
          bestH = h
          bestId = ids(i)
        }
        i += 1
      }
      if (bestId != null) out += NearDupHit(e.id, e.seq, bestId, bestH)
      ids += e.id
      sigs += e.sig
      if (ids.length > cap) { ids.remove(0); sigs.remove(0) }
    }
    state.update(BucketState(ids.toArray, sigs.toArray))
    out.iterator
  }

  /** Batch-side verdict resolution for [[nearDupCandidates]] output
    * (foreachBatch-friendly): one row per detected dup, keeping the best
    * hit across buckets (min hamming, then min original id). */
  def resolveNearDups(hits: DataFrame): DataFrame =
    hits.groupBy(col("id"))
      .agg(min(struct(col("hamming"), col("dupOf"))).as("best"))
      .select(col("id"), col("best.dupOf").as("dup_of"),
        col("best.hamming").as("hamming"))

  /** Streaming gap-based sessionization — the streaming twin of the
    * batch `Sessionize.rollup` (q26), on Spark's built-in
    * `session_window`: per key, events within `gap` of the session's
    * trailing edge merge into one window; the state store holds one
    * open window per (key, session), sharded by the groupBy shuffle.
    *
    * `session_start` equals the session's min event time, so rows align
    * 1:1 with the batch operator's sessions (SessionizeEquivSpec pins
    * the equivalence). Boundary caveat: session_window's trailing edge
    * is end-EXCLUSIVE — an event at exactly `prev + gap` starts a new
    * session here, while the batch operator's strict-> keeps it (a
    * microsecond-exact boundary hit; impossible-in-practice input).
    *
    * With a watermark (append mode), sessions finalize and state evicts
    * once the watermark passes their trailing edge; pass `delay=None`
    * only for complete-mode sinks (state then never evicts — batch
    * semantics at streaming cost, test use only). */
  def sessionRollup(
      events: DataFrame,
      keyCol: String = "user_id",
      tsCol: String = "ts",
      gap: String = "30 minutes",
      delay: Option[String] = Some("1 hour"),
      flag: org.apache.spark.sql.Column = lit(false)): DataFrame = {
    val in = delay.fold(events)(d => events.withWatermark(tsCol, d))
    in.groupBy(col(keyCol), session_window(col(tsCol), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"),
        (unix_timestamp(max(col(tsCol))) - unix_timestamp(min(col(tsCol))))
          .as("duration_s"),
        sum(when(flag, 1L).otherwise(0L)).as("n_flagged"))
      .select(col(keyCol), col("sw.start").as("session_start"),
        col("n_events"), col("duration_s"), col("n_flagged"))
  }

  /** Sliding-window trending counts: OVERLAPPING event-time windows
    * (`windowLen` long, advancing every `slide`) with per-window
    * event-type counts — "what's hot over the trailing hour, refreshed
    * every 15 minutes". Each event expands map-side into its
    * windowLen/slide covering windows (Spark's window generator), and
    * the aggregation partial-aggs per (window, type) before the one
    * shuffle — the overlap multiplies (window, type) keys, never raw
    * events across the wire. Late data beyond `delay` is dropped.
    *
    * Rank the finalized windows with [[topTrending]] in the sink's
    * foreachBatch: rank-over-an-append-stream is not incrementalizable,
    * counts are. */
  def slidingCounts(
      events: DataFrame,
      tsCol: String = "ts",
      typeCol: String = "event_type",
      delay: String = "1 hour",
      windowLen: String = "1 hour",
      slide: String = "15 minutes"): DataFrame =
    events
      .withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), windowLen, slide), col(typeCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"),
        col(typeCol), col("n_events"))

  /** Batch-side top-k per window over [[slidingCounts]] output
    * (foreachBatch-friendly; deterministic tiebreak by type name). */
  def topTrending(counts: DataFrame, typeCol: String = "event_type",
      k: Int = 3): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("window_start"))
      .orderBy(col("n_events").desc, col(typeCol))
    counts.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Stream-stream interval join: each purchase joins the same user's
    * view events from the trailing `window` — the streaming twin of the
    * batch RANGE-frame count (q27), as a true two-stream join. Both
    * sides are watermarked and the join condition bounds event time on
    * both ends, so Spark can size the join state and EVICT rows older
    * than the watermark (an unbounded-condition stream join would keep
    * state forever). Append mode: a match emits once both sides have
    * arrived; state is sharded by the user_id equi-key like any keyed
    * state.
    */
  def viewsBeforePurchase(
      views: DataFrame, purchases: DataFrame,
      delay: String = "1 hour", window: String = "1 hour"): DataFrame = {
    val v = views
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
        col("ts").as("v_ts"))
      .withWatermark("v_ts", delay)
    val p = purchases
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", delay)
    p.join(v,
      col("v_user") === col("user_id") &&
        col("v_ts") >= col("p_ts") - expr(s"INTERVAL $window") &&
        col("v_ts") < col("p_ts"))
      .select(col("purchase_id"), col("user_id"), col("view_id"),
        col("p_ts"), col("v_ts"))
  }

  /** Streaming distribution monitor: fixed-grid histogram bin counts as
    * a single update-mode aggregation — the streaming twin of the batch
    * histogram quantile sketch (pipeline/Sketch.histQuantiles). The
    * grid is STATIC (lo/width/bins pinned at query start): a streaming
    * agg cannot depend on a second min/max aggregation, and a
    * production monitor pins its grid anyway so week-over-week
    * histograms stay mergeable. Out-of-grid values clamp into the edge
    * bins (a monitor must count outliers, not drop them). State is at
    * most `bins` rows however long the stream runs; estimate quantiles
    * batch-side with [[quantilesFromBins]] in foreachBatch — the same
    * split as CMS and trending top-k.
    */
  def histBinCounts(
      values: DataFrame, valueCol: String,
      lo: Long, width: Long, bins: Int): DataFrame = {
    require(width > 0 && bins > 0)
    val d = col(valueCol).cast("long") - lit(lo)
    // exact floor-div (see operators/RangeJoin): pmod keeps it correct
    // for below-grid values, then both ends clamp
    val raw = ((d - pmod(d, lit(width))) / lit(width)).cast("long")
    val bin = least(greatest(raw, lit(0L)), lit(bins - 1L))
    values.groupBy(bin.as("bin")).agg(count(lit(1)).as("cnt"))
  }

  /** Quantile estimates over a [[histBinCounts]] state table
    * (foreachBatch-side): one row with `n` and a `p<q>_est` inclusive
    * upper-edge estimate per requested permille — same arithmetic as
    * the batch sketch, exact integers throughout. */
  def quantilesFromBins(
      binCounts: DataFrame, lo: Long, width: Long,
      qsPermille: Seq[Int]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("bin"))
      .rowsBetween(Long.MinValue, 0)
    val cum = binCounts
      .withColumn("__cum", sum(col("cnt")).over(w))
      .withColumn("__n", sum(col("cnt")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("__edge", lit(lo) + (col("bin") + 1) * lit(width) - 1)
    val ests = qsPermille.map { q =>
      min(when(col("__cum") >= expr(s"($q * __n + 999) DIV 1000"),
        col("__edge"))).as(s"p${q}_est")
    }
    cum.agg(max(col("__n")).as("n"), ests: _*)
  }

  /** Event-time windowed rates with watermarking — the tumbling-window
    * aggregation the reference lacks any analog for (SURVEY §2.11 note:
    * no event-time semantics). Late data beyond `delay` is dropped;
    * q16_time_buckets is the batch twin of this plan. */
  def windowedRates(
      events: DataFrame,
      tsCol: String = "ts",
      delay: String = "1 hour",
      windowLen: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("total_value"))
}
