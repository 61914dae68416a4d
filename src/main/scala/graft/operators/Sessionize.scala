package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: consecutive events of the same key belong
  * to one session while the gap between them is <= `gapMicros`; a
  * strictly larger gap starts a new session.
  *
  * Batch analog of Structured Streaming's `session_window` (same
  * merge-on-gap semantics), expressed as two key-partitioned window
  * passes — lag to detect gap starts, running sum to number sessions.
  * Both windows partition by the key, so the plan is ONE shuffle on key
  * and scales horizontally; there is no global sort and no state beyond
  * a running counter per group.
  *
  * Gap arithmetic is integer microseconds (`unix_micros`), exact at
  * timestamp precision — float seconds would misclassify boundary gaps.
  */
object Sessionize {

  /** Appends `session_id` (1-based, per key, in time order) to `events`.
    *
    * @param key       grouping column name (e.g. user id)
    * @param ts        event-time timestamp column name
    * @param gapMicros session gap in microseconds; a new session starts
    *                  when `ts - prev_ts > gapMicros`
    * @param tiebreak  extra ordering columns for deterministic order
    *                  among equal timestamps within a key
    */
  def assign(
      events: DataFrame,
      key: String,
      ts: String,
      gapMicros: Long,
      tiebreak: Seq[String] = Nil): DataFrame = {
    val order: Seq[Column] = col(ts) +: tiebreak.map(col)
    val w = Window.partitionBy(key).orderBy(order: _*)
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("__prev_us", lag(unix_micros(col(ts)), 1).over(w))
      .withColumn("__starts",
        when(col("__prev_us").isNull ||
          unix_micros(col(ts)) - col("__prev_us") > gapMicros, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("__starts")).over(wRun))
      .drop("__prev_us", "__starts")
  }

  /** Per-session rollup: event count, span in whole seconds, and count
    * of events matching `flag` (e.g. purchases per session). */
  def rollup(
      events: DataFrame,
      key: String,
      ts: String,
      gapMicros: Long,
      flag: Column,
      tiebreak: Seq[String] = Nil): DataFrame =
    assign(events, key, ts, gapMicros, tiebreak)
      .groupBy(col(key), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        (unix_timestamp(max(col(ts))) - unix_timestamp(min(col(ts))))
          .as("duration_s"),
        sum(when(flag, 1L).otherwise(0L)).as("n_flagged"))
}
