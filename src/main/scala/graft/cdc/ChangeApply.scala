package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Set-oriented CDC apply — the reference's per-change upsert decision
  * tree (reference lib/index.js:96-196, SURVEY.md §2.11 T1-T4) collapsed
  * into one distributed merge per batch.
  *
  * The reference serializes changes one-by-one (async.queue concurrency 1,
  * lib/index.js:40) and issues 2-3 SQL round-trips per change — its main
  * inefficiency (~625 docs/s ceiling, BASELINE.md). Here the whole batch
  * becomes ONE plan:
  *
  *   1. per-key last-write-wins dedup: keep max(seq) per id (makes global
  *      ordering unnecessary — T1);
  *   2. full-outer merge against current state keyed by id:
  *      - incoming delete  -> row dropped (or NOOP if absent);
  *      - incoming doc, absent in state      -> INSERT (unless excluded type);
  *      - incoming doc, present, rev differs -> UPDATE;
  *      - incoming doc, present, rev equal   -> NOOP (idempotent replay /
  *        echo suppression — full-string rev compare, lib/index.js:110).
  *
  * SCALE: both sides shuffle-partition on `id`; at 100 TB the state table
  * should be bucketed by id so only the (much smaller) batch moves.
  * `planActions` additionally exposes the per-row decision so a sink can
  * skip rev-equal NOOP writes entirely (write amplification = changed
  * rows only).
  */
object ChangeApply {

  /** State schema: (id, rev, doc) — the `(id text PRIMARY KEY, doc jsonb)`
    * document table (README.md:285-290) plus the rev needed for
    * idempotence (reference reads it back per-change, lib/index.js:99;
    * we keep it denormalized to avoid the read). */
  val stateCols: Seq[String] = Seq("id", "rev", "doc")

  /** T1: collapse a batch to its latest change per key — max(seq) wins;
    * ties prefer the delete (same order the reference would apply them).
    * Duplicate (id, seq) pairs (at-least-once redelivery) also collapse.
    *
    * Implemented as max_by aggregation, not a row_number window: the
    * aggregate combines map-side (partial agg), so the shuffle carries
    * one row per key per partition instead of every change — the
    * difference between O(batch) and O(keys) network at 100 TB. */
  def latestPerKey(changes: DataFrame): DataFrame =
    changes
      .groupBy(col("id"))
      .agg(max_by(
        struct(col("seq"), col("rev"), col("deleted"), col("doc")),
        struct(col("seq"), col("deleted"))).as("__top"))
      .select(col("id"), col("__top.seq").as("seq"),
        col("__top.rev").as("rev"), col("__top.deleted").as("deleted"),
        col("__top.doc").as("doc"))

  /** Per-row merge decision — the T4 grid, exposed for tests and for
    * sinks that want NOOP-skipping writes.
    *
    * Returns columns: id, action ∈ {INSERT, UPDATE, NOOP, DELETE,
    * DELETE_NOOP, IGNORE}, plus the post-merge (rev, doc).
    */
  def planActions(
      state: DataFrame,
      changes: DataFrame,
      excludeTypes: Set[String] = Set.empty): DataFrame = {
    val latest = latestPerKey(changes)
    val s = state.select(
      col("id").as("s_id"), col("rev").as("s_rev"), col("doc").as("s_doc"))
    val c = latest.select(
      col("id").as("c_id"), col("rev").as("c_rev"),
      col("deleted").as("c_deleted"), col("doc").as("c_doc"))
    // Type-exclusion ingest filter (lib/index.js:131-146, P8). The
    // reference's check guards only the insert branch, so updates to an
    // already-present excluded-type doc still pass through.
    val excluded: Column =
      if (excludeTypes.isEmpty) lit(false)
      else get_json_object(col("c_doc"), "$.type")
        .isin(excludeTypes.toSeq: _*)

    s.join(c, col("s_id") === col("c_id"), "full_outer")
      .select(
        coalesce(col("s_id"), col("c_id")).as("id"),
        when(col("c_id").isNull, lit("NOOP"))
          .when(col("c_deleted") && col("s_id").isNotNull, lit("DELETE"))
          .when(col("c_deleted"), lit("DELETE_NOOP"))
          .when(col("s_id").isNull && excluded, lit("IGNORE"))
          .when(col("s_id").isNull, lit("INSERT"))
          .when(col("s_rev") === col("c_rev"), lit("NOOP"))
          .otherwise(lit("UPDATE")).as("action"),
        col("s_rev"), col("s_doc"), col("c_rev"), col("c_doc"))
  }

  private def withMapDoc(changes: DataFrame,
      mapDoc: Option[Column => Column]): DataFrame =
    mapDoc.fold(changes)(f =>
      changes.withColumn("doc",
        when(col("deleted"), col("doc")).otherwise(f(col("doc")))))

  /** A statically-empty plan (LocalRelation with no rows) — the only
    * case where emptiness is knowable without running a job. An empty
    * LogicalRDD/parquet scan is NOT detected; use [[initialState]]
    * directly when the caller knows there is no state yet (first
    * batch), as [[graft.streaming.MergeSink]] does. */
  private def isKnownEmpty(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan match {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
        l.data.isEmpty
      case _ => false
    }

  /** First-batch fast path: with no existing state the T4 grid needs no
    * join at all — every surviving change is an INSERT. O(batch): one
    * partial-agg'd latestPerKey, a filter, zero extra shuffles (the
    * full-outer merge would shuffle the empty state through every
    * partition for nothing). Equivalent to
    * `applyChanges(emptyState, changes, ...)` row-for-row. */
  def initialState(
      changes: DataFrame,
      excludeTypes: Set[String] = Set.empty,
      mapDoc: Option[Column => Column] = None): DataFrame = {
    val latest = latestPerKey(withMapDoc(changes, mapDoc))
    val excluded: Column =
      if (excludeTypes.isEmpty) lit(false)
      else get_json_object(col("doc"), "$.type")
        .isin(excludeTypes.toSeq: _*)
    latest
      .where(!col("deleted") && !excluded)
      .select(col("id"), col("rev"), col("doc"))
  }

  /** Apply one batch of changes to the state, returning the new state
    * (id, rev, doc). Optional per-doc transform hook = the reference's
    * `opts.map(doc)` (lib/index.js:188-190, P9). A statically-empty
    * state short-circuits to [[initialState]] (no join). */
  def applyChanges(
      state: DataFrame,
      changes: DataFrame,
      excludeTypes: Set[String] = Set.empty,
      mapDoc: Option[Column => Column] = None): DataFrame =
    if (isKnownEmpty(state)) initialState(changes, excludeTypes, mapDoc)
    else {
      planActions(state, withMapDoc(changes, mapDoc), excludeTypes)
        .where(col("action").isin("NOOP", "INSERT", "UPDATE"))
        .select(
          col("id"),
          when(col("action") === "NOOP", col("s_rev"))
            .otherwise(col("c_rev")).as("rev"),
          when(col("action") === "NOOP", col("s_doc"))
            .otherwise(col("c_doc")).as("doc"))
    }

  /** Fold a sequence of batches (streaming replay / catch-up). */
  def applyAll(state: DataFrame, batches: Seq[DataFrame]): DataFrame =
    batches.foldLeft(state)((s, b) => applyChanges(s, b))
}
