package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.cdc.ChangeEvent

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
