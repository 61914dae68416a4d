package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

import graft.{SparkSpec, SparkEntry}

/** Plan-discipline specs: the physical plans that must hold at 100 TB —
  * filter pushdown to the scan, column pruning, broadcast for dims,
  * partial (map-side) aggregation, top-k instead of full sort, and no
  * cartesian products in the LSH joins.
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  test("q2: filter and projection reach the parquet scan") {
    val p = plan("q2_filter_project")
    assert(p.contains("PushedFilters:"))
    assert(p.contains("IsNotNull(l_shipdate)") || p.contains("LessThan(l_shipdate"))
    // column pruning: scan reads only the needed columns, not all 16
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_tax"))
  }

  test("q13: dimension joins are broadcast, not shuffled") {
    val p = plan("q13_dim_join")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q1: aggregation is partial (map-side) then final") {
    val p = plan("q1_pricing_summary")
    val hashAggs = p.linesIterator.count(_.contains("HashAggregate"))
    assert(hashAggs >= 2, s"expected partial+final HashAggregate:\n$p")
  }

  test("q4: global top-k compiles to TakeOrdered, not a full sort") {
    val p = plan("q4_topk_orders")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q3: revenue pre-aggregates to order grain — raw lineitem never shuffles") {
    val p = plan("q3_join_revenue")
    // three aggregation grains (order, customer, segment), each
    // partial+final = 6 HashAggregate nodes; the order-grain partial
    // sits below the first join, so the exchange carries ~|orders|
    // combined rows instead of |lineitem| raw rows.
    val hashAggs = p.linesIterator.count(_.contains("HashAggregate"))
    assert(hashAggs >= 6, s"expected 3 partial+final aggregate grains:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("LSH pair joins are equi-joins on band keys (no cartesian)") {
    for (name <- Seq("p2_minhash_lsh", "p4_simhash_pairs",
        "p82_lsh_bucket_cap", "p83_lsh_hot_buckets")) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name has a cartesian:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin") || p.contains("HashJoin"),
        s"$name joins without an equi-key:\n$p")
    }
  }

  test("ANN brute force broadcasts the query set (corpus never shuffles)") {
    val p = plan("p7_ann_brute")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("p7b: IVF cell assignment is a literal-folded projection (no assignment join)") {
    val p = plan("p7b_ann_ivf")
    // pivots are folded into the plan as literals: the only join is the
    // broadcast probe join — corpus-vs-pivot affinity must NOT be a join
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"probe side should broadcast:\n$p")
    assert(!p.contains("CartesianProduct"))
    assert(p.linesIterator.count(l => l.contains(") BroadcastHashJoin") ||
      l.contains(") SortMergeJoin") || l.contains(") ShuffledHashJoin")) <= 1,
      s"cell assignment should be a projection, not a join:\n$p")
  }

  test("p7c: persisted IVF probe reads only probed cell partitions") {
    val df = SparkEntry.queries("p7c_ann_ivf_prebucket")(spark, dir)
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    val scanBlock = p.linesIterator.filter(l =>
      l.contains("PartitionFilters")).mkString("\n")
    assert(scanBlock.contains("cell"),
      s"no partition filter on the IVF index scan:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q24: percentiles partial-aggregate map-side (ObjectHashAggregate)") {
    val p = plan("q24_percentiles")
    assert(p.contains("partial_percentile"),
      s"percentile must combine map-side before the shuffle:\n$p")
    assert(p.linesIterator.count(_.contains(") ObjectHashAggregate")) == 2,
      s"expected partial+final ObjectHashAggregate pair:\n$p")
  }

  test("p19: capping window is partitioned by group (no global sort)") {
    val p = plan("p19_source_cap")
    assert(p.contains("windowspecdefinition(source"),
      s"capPerGroup window must partition by the group column:\n$p")
  }

  test("p20: contamination joins on fixed-width hashes only (no text shuffle)") {
    val p = plan("p20_contamination")
    assert(!p.contains("CartesianProduct"))
    // the join key is the md5 column, not document text
    val joinLines = p.linesIterator.filter(_.contains("Join")).mkString("\n")
    assert(!joinLines.contains("text"), s"join carries text:\n$joinLines")
  }

  test("j16: first-batch CDC merge is join-free (empty-state short-circuit)") {
    val p = plan("j16_cdc_merge")
    assert(!p.contains("Join"),
      s"empty-state merge should skip the full-outer join:\n$p")
    // and still partial-aggregates the latest-per-key dedup
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2 ||
      p.linesIterator.count(_.contains("SortAggregate")) >= 2)
  }

  test("p8b: pre-bucketed ANN probe reads only probed bucket partitions") {
    val df = SparkEntry.queries("p8b_ann_prebucket")(spark, dir)
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    // the index scan must carry the probed-bucket partition filter —
    // at scale this is the difference between reading |probed| bucket
    // directories and reading the whole corpus
    val scanBlock = p.linesIterator.filter(l =>
      l.contains("PartitionFilters")).mkString("\n")
    assert(scanBlock.contains("bucket"),
      s"no partition filter on the bucketed index scan:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("p86: filtered probe pushes the metadata predicate to the pruned scan") {
    val df = SparkEntry.queries("p86_ann_filtered")(spark, dir)
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    // both levers at once: bucket partition pruning AND the label
    // predicate pushed into the Parquet scan — the filter must never
    // run after scoring
    val scanBlock = p.linesIterator.filter(l =>
      l.contains("PartitionFilters")).mkString("\n")
    assert(scanBlock.contains("bucket"),
      s"no partition filter on the index scan:\n$p")
    assert(p.contains("PushedFilters") && p.contains("label"),
      s"label predicate not pushed to the scan:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q25: as-of join plans as keyed window, not a join") {
    val p = plan("q25_asof_join")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("Join"), s"as-of must not plan a pair join:\n$p")
    assert(p.contains("windowspecdefinition(__k"), s"window not keyed:\n$p")
  }

  test("q26: sessionization windows partition by user (no global sort)") {
    val p = plan("q26_sessionize")
    assert(p.contains("windowspecdefinition(user_id"),
      s"session window must partition by user_id:\n$p")
    assert(!p.contains("No Partition Defined"))
  }

  test("p22: vocab aggregates partially map-side and top-k via TakeOrdered") {
    val p = plan("p22_vocab")
    assert(p.contains("TakeOrderedAndProject"), s"top-100 should TakeOrdered:\n$p")
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2,
      s"expected partial+final aggregation:\n$p")
  }

  test("p23: corpus df table broadcasts onto per-doc counts") {
    val p = plan("p23_top_terms")
    assert(p.contains("BroadcastHashJoin"), s"df join should broadcast:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("p24: PII scrub is a pure projection — no shuffle before the sort") {
    val p = plan("p24_pii_scrub")
    // exactly one exchange: the final global ORDER BY; scrubbing itself
    // must not repartition anything
    assert(p.linesIterator.count(_.contains(") Exchange")) <= 1,
      s"scrub should not shuffle:\n$p")
  }

  test("q27: range count plans as keyed RANGE-frame window, not a pair join") {
    val p = plan("q27_range_count")
    assert(!p.contains("Join"), s"range count must not materialize pairs:\n$p")
    assert(p.contains("windowspecdefinition(user_id"), s"window not keyed:\n$p")
    assert(p.contains("specifiedwindowframe(RangeFrame"), s"no range frame:\n$p")
  }

  test("p25: length histogram partial-aggregates map-side") {
    val p = plan("p25_length_hist")
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2,
      s"expected partial+final aggregation:\n$p")
  }

  test("p26: balanced sample broadcasts group counts (data never shuffles)") {
    val p = plan("p26_balanced_sample")
    assert(p.contains("BroadcastHashJoin"), s"counts join should broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"document side must not shuffle for the counts join:\n$p")
  }

  test("p27: unigram LM broadcasts onto the token stream; text never shuffles") {
    val p = plan("p27_unigram_logprob")
    assert(p.contains("BroadcastHashJoin"), s"LM join should broadcast:\n$p")
    // the only exchanges are for the vocab/doc aggregates (hash keys +
    // partial counts) and the final sort — none may carry the text column
    val exchanges = p.linesIterator.filter(_.contains("Arguments: hashpartitioning"))
    assert(exchanges.forall(!_.contains("text")), s"text shuffles:\n$p")
  }

  test("p28: kNN scoring broadcasts queries and survivor set (corpus streams)") {
    val p = plan("p28_knn_label")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("SortMergeJoin"), s"corpus must not shuffle to score:\n$p")
  }

  test("q8/q17/q28: global ranks are distributed — no single-partition window") {
    // the round-4 verdict's last scale-killer shape: a corpus-proportional
    // frame must never flow through Exchange SinglePartition. After the
    // DistributedRank rewrite the only window is partition-local
    // (partitioned by the range-partition id) and the offsets join is a
    // broadcast of one row per partition.
    for (name <- Seq("q8_bulk_chunks", "q17_multikey_sort", "q28_ntile")) {
      val p = plan(name)
      assert(!p.contains("SinglePartition"),
        s"$name funnels a corpus-proportional frame through one task:\n$p")
      assert(p.contains("windowspecdefinition(__dr_pid"),
        s"$name window is not partition-local:\n$p")
      assert(p.contains("BroadcastHashJoin"),
        s"$name prefix-offset join should broadcast:\n$p")
    }
  }

  test("q29: CUBE still partial-aggregates map-side (Expand before shuffle)") {
    val p = plan("q29_cube")
    assert(p.contains("Expand"), s"grouping-set expansion missing:\n$p")
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2,
      s"expected partial+final aggregation around the shuffle:\n$p")
  }

  test("q30: moving average is one keyed window (no self-join)") {
    val p = plan("q30_moving_avg")
    assert(!p.contains("Join"), s"frame must not materialize pairs:\n$p")
    assert(p.contains("windowspecdefinition(user_id"), s"window not keyed:\n$p")
  }

  test("p29: BPE pairs explode off the vocab and take top-k via TakeOrdered") {
    val p = plan("p29_bpe_pairs")
    // pair explosion must sit above the vocab aggregate (vocab ≪ corpus)
    assert(p.contains("Generate"), s"pair explode missing:\n$p")
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 4,
      s"expected partial+final agg for vocab AND pair counts:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-k should not full-sort:\n$p")
  }

  test("q31: dense_rank/lead windows partition by nation (no global sort)") {
    val p = plan("q31_dense_rank_lead")
    assert(p.contains("windowspecdefinition(c_nationkey"), s"window not keyed:\n$p")
    assert(!p.contains("Join"), p)
  }

  test("p31: curation pipeline projects text away before any shuffle") {
    val p = plan("p31_curation_e2e")
    val exchanges = p.linesIterator
      .filter(_.contains("Arguments: hashpartitioning")).toSeq
    assert(exchanges.nonEmpty)
    assert(exchanges.forall(!_.contains("text")),
      s"text must not shuffle in the composed pipeline:\n$p")
  }

  test("q32: bucketed join needs no exchange on the join key") {
    // at test scale Catalyst would broadcast the small side; disable it
    // to model the big-big regime the bucketed layout exists for
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val p = plan("q32_bucketed_join")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
      // the only exchanges are the post-join aggregation + final sort —
      // neither side shuffles on orderkey (bucket layout co-locates them)
      val exchanges = p.linesIterator
        .filter(_.contains("Arguments: hashpartitioning")).toSeq
      assert(exchanges.forall(!_.contains("orderkey")),
        s"join key shuffled despite bucketing:\n$p")
      assert(p.contains("Bucketed: true"), s"scan not bucket-aware:\n$p")
    } finally spark.conf.set(key, prev)
  }

  test("p34: weighted sample top-k compiles to TakeOrdered, not a full sort") {
    val p = plan("p34_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("p35: sorted-neighborhood rank is bucket-partitioned, text never shuffles") {
    val p = plan("p35_sorted_neighbors")
    // the global rank must come from the bkt-partitioned window — a
    // window over the corpus with no partition keys would funnel every
    // row through one task (the round-3 advisor finding)
    assert(p.matches("(?s).*windowspecdefinition\\(bkt#\\d+L?, sig#.*"),
      s"corpus window must be partitioned by bkt:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    // every shuffle carries fixed-width (idx, doc_id, sig) triples only
    val exchanges = p.linesIterator
      .filter(_.contains("Arguments: hashpartitioning")).toSeq
    assert(exchanges.forall(!_.contains("text")),
      s"text must never shuffle:\n$p")
  }

  test("p36: median/MAD stats broadcast back (corpus never shuffles)") {
    val p = plan("p36_length_outliers")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"corpus must not shuffle for the stats joins:\n$p")
  }

  test("p37/p39: LM and margin tables broadcast onto their streams") {
    for (name <- Seq("p37_bigram_surprisal", "p39_pmi_pairs")) {
      val p = plan(name)
      assert(p.contains("BroadcastHashJoin"), s"$name: LM join should broadcast:\n$p")
      val exchanges = p.linesIterator.filter(_.contains("Arguments: hashpartitioning"))
      assert(exchanges.forall(!_.contains("text")), s"$name: text shuffles:\n$p")
    }
  }

  test("p38: vocab growth needs one token aggregate, not a per-doc scan loop") {
    val p = plan("p38_vocab_growth")
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2, p)
    assert(p.contains("windowspecdefinition"), p)
  }

  test("q33: regression statistics partial-aggregate map-side (mergeable)") {
    val p = plan("q33_regression")
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2,
      s"sufficient statistics must partial-agg:\n$p")
    assert(!p.contains("Join"), p)
  }

  test("whole-stage codegen covers the custom hash expressions") {
    // AQE shows codegen spans only in the final plan: execute first
    val df = SparkEntry.queries("p3_simhash_sig")(spark, dir)
    df.collect()
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    // the SimHash projection must be inside a codegen stage ("[codegen
    // id : N]" tag), not a standalone interpreted Project — this is the
    // whole point of the custom expression over the HOF formulation
    val projLine = p.linesIterator
      .dropWhile(!_.matches(".*\\(\\d+\\) Project.*")).take(2).mkString("\n")
    assert(projLine.contains("codegen id"), s"Project not codegen'd:\n$p")
    assert(p.contains("simhashexpr"))
  }

  test("p41/p42: repetition and quantization audits are shuffle-free projections") {
    for (name <- Seq("p41_repetition", "p42_embed_quantize")) {
      val p = plan(name)
      // one codegen'd pass per row; the only exchange is the final sort
      assert(!p.contains("Arguments: hashpartitioning"),
        s"$name must not shuffle:\n$p")
      assert(!p.contains("Join"), s"$name must not join:\n$p")
    }
  }

  test("p43: incremental dedup anti-join carries hashes only") {
    val p = plan("p43_incremental_dedup")
    assert(p.contains("LeftAnti"), s"expected anti join:\n$p")
    val exchanges = p.linesIterator
      .filter(_.contains("Arguments: hashpartitioning")).toSeq
    assert(exchanges.forall(!_.contains("text")),
      s"text must never shuffle:\n$p")
  }

  test("p44: CMS grid aggregates partially map-side; sketch broadcasts onto keys") {
    val p = plan("p44_cms_heavyhitters")
    // the custom TypedImperativeAggregate must show partial + final
    // (ObjectHashAggregate pairs), proving the fixed-size grid merges
    // map-side instead of shipping raw keys
    val objAggs = p.linesIterator.count(_.contains("ObjectHashAggregate"))
    assert(objAggs >= 2, s"expected partial+final ObjectHashAggregate:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"1-row sketch must broadcast:\n$p")
  }

  test("p46: chunking is generator fan-out — no shuffle before the sort") {
    val p = plan("p46_chunk_windows")
    assert(p.contains("Generate"), p)
    assert(!p.contains("Arguments: hashpartitioning"),
      s"chunking must not shuffle:\n$p")
  }

  test("p47/p48: centroid sums partial-aggregate; centroids broadcast back") {
    val p47 = plan("p47_label_centroids")
    val hashAggs = p47.linesIterator.count(_.contains("HashAggregate"))
    assert(hashAggs >= 2, s"expected partial+final HashAggregate:\n$p47")
    val p48 = plan("p48_centroid_outliers")
    assert(p48.contains("BroadcastHashJoin"),
      s"centroid table must broadcast:\n$p48")
    assert(!p48.contains("SortMergeJoin"), p48)
  }

  test("q39: six-way join broadcasts every dimension, never cartesians") {
    val p = plan("q39_multiway_join")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    // region filter prunes before any join: the region scan carries it
    assert(p.contains("PushedFilters: [IsNotNull(r_name), EqualTo(r_name,ASIA)]")
      || p.contains("EqualTo(r_name,ASIA)"), s"region filter not pushed:\n$p")
    // column pruning on the widest table
    val readSchemas = p.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(readSchemas.forall(!_.contains("l_comment")), p)
  }

  test("q38: correlated scalar subqueries decorrelate to aggregate joins") {
    // q38 leans on Catalyst's RewriteCorrelatedScalarSubquery: both
    // correlated scalars must become (aggregate on o_custkey) ⋈ orders
    // equi-joins. Pin it so a Spark upgrade can't silently regress the
    // plan to a per-row nested-loop re-execution of the subqueries.
    val p = plan("q38_correlated_subquery")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"correlated subquery planned as a nested loop:\n$p")
    val hashAggs = p.linesIterator.count(_.contains("HashAggregate"))
    assert(hashAggs >= 2, s"expected decorrelated aggregates:\n$p")
    val joins = p.linesIterator.count(l => l.contains(") BroadcastHashJoin") ||
      l.contains(") SortMergeJoin") || l.contains(") ShuffledHashJoin"))
    assert(joins >= 1 && joins <= 2,
      s"expected the two scalars to join back as aggregate equi-joins:\n$p")
  }

  test("p52: SemDeDup pairs join on the cell key; assignment is a projection") {
    // SemDeDup's whole scale argument is that pair comparison is
    // confined to cells: the pair join must be a cell-keyed equi-join
    // (never cartesian/nested-loop over the corpus), cell assignment a
    // literal-folded projection (no join — same pin as p7b), and the
    // drop-list min a partial aggregate.
    val p = plan("p52_semantic_dedup")
    assert(!p.contains("CartesianProduct"), s"pair join is cartesian:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"pair join lost its cell equi-key:\n$p")
    val hashAggs = p.linesIterator.count(_.contains("HashAggregate"))
    assert(hashAggs >= 2, s"drop-list min is not partial-agg'd:\n$p")
  }

  test("p53: bloom probe filters the corpus before any exchange") {
    // the whole point of the bloom path: the corpus-side shingle stream
    // is reduced BEFORE it shuffles. The probe must appear as a filter
    // (not a join), the 1-row filter relation must broadcast, and no
    // cartesian may appear anywhere.
    val p = plan("p53_bloom_decontaminate")
    val lower = p.toLowerCase
    assert(lower.contains("bloomcontains"),
      s"bloom probe missing from the plan:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in bloom path:\n$p")
    // the bloom (a 1-row aggregate) reaches the probe via broadcast
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"bloom filter not broadcast:\n$p")
  }

  test("ANN ranking tails are bounded partial top-k aggregates, not windows") {
    // the round-4 sf1 curve's worst offender: ranking Q x N scored pairs
    // through row_number() shuffles every pair (225M rows at sf1 for the
    // brute path). The TopKAggExpr rewrite partial-aggregates map-side,
    // so only bounded k-entry buffers reach the exchange. Pin: no Window
    // node anywhere in an ANN scoring plan, and the aggregate is the
    // object-hash kind (TypedImperativeAggregate) with a partial pass.
    // p7b/p28 keep one PARTITIONED window each over a bounded frame
    // (probe-rank over nPivots cells; label votes over <= k labels) —
    // those are fine; the windowless pin applies to the pure-scoring
    // paths where any Window would mean pair-proportional shuffle.
    for (name <- Seq("p7_ann_brute", "p8_ann_lsh", "p8b_ann_prebucket",
        "p7b_ann_ivf", "p28_knn_label", "p90_hard_negatives")) {
      val p = plan(name)
      assert(p.contains("ObjectHashAggregate"),
        s"$name lost the typed top-k aggregate:\n$p")
      assert(p.toLowerCase.contains("partial_topkaggexpr"),
        s"$name top-k aggregate is not partial (map-side):\n$p")
      assert(!p.contains("SinglePartition"),
        s"$name funnels through one task:\n$p")
    }
    for (name <- Seq("p7_ann_brute", "p8_ann_lsh", "p8b_ann_prebucket")) {
      val p = plan(name)
      assert(!p.linesIterator.exists(_.matches(".*\\) Window$")),
        s"$name ranks through a window (unbounded pair shuffle):\n$p")
    }
  }

  test("p88: BM25 prunes postings with broadcast terms and ranks via top-k") {
    // inverted-index discipline: the query-term set, df table and corpus
    // stats broadcast onto the token stream (never a shuffled join with
    // the corpus), and the ranking tail is the bounded TopK aggregate —
    // no Window node means the scored postings never shuffle wholesale.
    val p = plan("p88_bm25_topk")
    assert(p.contains("BroadcastHashJoin"), s"query-term prune not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus-sized shuffle join in BM25:\n$p")
    assert(p.toLowerCase.contains("partial_topkaggexpr"),
      s"BM25 ranking is not a partial top-k aggregate:\n$p")
    assert(!p.linesIterator.exists(_.matches(".*\\) Window$")),
      s"BM25 ranks through a window (postings-stream shuffle):\n$p")
  }

  test("p88b: index probe prunes token-bucket partitions and pushes the term filter") {
    // the standing-index contract: a probe must read ONLY the buckets
    // the query terms hash into (partition pruning = the index lookup),
    // push `token IN (...)` to the scan, and rank through the bounded
    // top-k aggregate like every other retrieval tail.
    val p = plan("p88b_bm25_index")
    val scans = p.linesIterator.filter(_.contains("PartitionFilters")).toSeq
    assert(scans.exists(_.contains("tb#")),
      s"postings scan has no tb partition filter:\n$p")
    assert(p.linesIterator.exists(l =>
        l.contains("PushedFilters") && l.contains("In(token")),
      s"token IN filter not pushed to the postings scan:\n$p")
    assert(p.toLowerCase.contains("partial_topkaggexpr"),
      s"index probe lost the partial top-k aggregate:\n$p")
  }

  test("p91: passage scoring stays broadcast + partial top-k, chunks never sort") {
    // chunk generation is a map-side explode; df/stats/query-terms
    // broadcast; the max-passage layer partial-aggregates; ranking is
    // the bounded top-k — a Window or SortMergeJoin here would mean a
    // chunk-proportional shuffle.
    val p = plan("p91_passage_topk")
    assert(p.contains("BroadcastHashJoin"), s"posting prune not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"chunk-sized shuffle join:\n$p")
    assert(p.toLowerCase.contains("partial_topkaggexpr"),
      s"passage ranking lost the partial top-k:\n$p")
    assert(!p.linesIterator.exists(_.matches(".*\\) Window$")),
      s"passage ranking through a window:\n$p")
  }

  test("q37: z-order block stats partial-aggregate map-side") {
    val p = plan("q37_zorder_layout")
    val hashAggs = p.linesIterator.count(_.contains("HashAggregate"))
    assert(hashAggs >= 2, s"expected partial+final HashAggregate:\n$p")
    // the interleave is built from codegen'd integer builtins — the
    // scan must read only the two key columns
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(readSchema.contains("l_partkey") && readSchema.contains("l_suppkey"))
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_extendedprice"))
  }

  test("p54: windowed dedup partitions by compound key, never globally") {
    val p = plan("p54_window_dedup")
    // the ranking window must carry the full (user, type, bucket) key —
    // a window missing the bucket (or empty partitioning) funnels a
    // key's whole history through one task
    val winLine = p.linesIterator.find(_.contains("row_number()")).get
    assert(winLine.contains("user_id") && winLine.contains("event_type")
      && winLine.contains("win_bucket"),
      s"window must partition by (user_id, event_type, win_bucket):\n$p")
  }

  test("p55: source overlap shuffles hashes once; no cartesian anywhere") {
    val p = plan("p55_source_overlap")
    assert(!p.contains("CartesianProduct"), s"p55 has a cartesian:\n$p")
    // per-source sizes join back by broadcast (pair table is tiny)
    assert(p.contains("BroadcastHashJoin"), s"sizes should broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"nothing in p55 justifies a sort-merge exchange:\n$p")
    // text must be projected away before any exchange: only hashes and
    // source names shuffle
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("n_chars") && !readSchema.contains("lang"))
    // the per-hash source state is an 8-byte bit_or mask, never a
    // collect_set of strings — and downstream of the h-shuffle every
    // frame is mask-count-sized, so no second corpus-scale exchange
    assert(p.contains("bit_or"), s"per-hash state must be a bitmask:\n$p")
    assert(!p.contains("collect_set"),
      s"no string-set aggregate may survive:\n$p")
    // the corpus-scale groupBy key is the 16-byte unhex(md5) binary
    assert(p.contains("unhex"), s"h must ship as binary, not hex text:\n$p")
  }

  test("p93: wide source overlap keeps the segmented-bitmask shape") {
    val p = plan("p93_source_overlap_wide")
    assert(!p.contains("CartesianProduct"), s"p93 has a cartesian:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"nothing in p93 justifies a sort-merge exchange:\n$p")
    // >62 sources: per-hash state is still bit_or'd longs (two words),
    // never a string set; the corpus-scale key stays binary
    assert(p.contains("bit_or"), s"per-hash state must be a bitmask:\n$p")
    assert(!p.contains("collect_set"),
      s"no string-set aggregate may survive:\n$p")
    assert(p.contains("unhex"), s"h must ship as binary, not hex text:\n$p")
  }

  test("p56: tf-idf df table and corpus count broadcast onto term counts") {
    val p = plan("p56_tfidf")
    assert(p.contains("BroadcastHashJoin"), s"df table should broadcast:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the one-row corpus count should broadcast:\n$p")
    assert(!p.contains("CartesianProduct"))
    // the ranking window partitions by doc
    val winLine = p.linesIterator.find(_.contains("row_number()")).get
    assert(winLine.contains("doc"), s"window must partition by doc:\n$p")
  }

  test("q40: interval join is a bucket equi-join, never a nested loop") {
    val p = plan("q40_range_join")
    assert(!p.contains("CartesianProduct"), s"q40 has a cartesian:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"q40 must not nested-loop the range predicate:\n$p")
    // the pair join carries an equi-key (the quantized bucket)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), s"no equi-join found:\n$p")
  }

  test("p57: quota table broadcasts; corpus rank window partitions by stratum") {
    val p = plan("p57_stratified_quota")
    assert(p.contains("BroadcastHashJoin"),
      s"strata quota table should broadcast onto the corpus:\n$p")
    // the corpus-proportional window must partition by the strata;
    // the only unpartitioned windows run on the |strata|-row aggregate
    val corpusWin = p.linesIterator.filter(_.contains("row_number()"))
      .filter(l => !l.contains("__rrk")).toSeq
    assert(corpusWin.nonEmpty && corpusWin.forall(l =>
      l.contains("lang") && l.contains("source")),
      s"corpus rank must partition by (lang, source):\n$p")
  }

  test("p58: histogram sketch aggregates partially before the group shuffle") {
    val p = plan("p58_hist_quantiles")
    val hashAggs = p.linesIterator.count(_.contains("HashAggregate"))
    assert(hashAggs >= 2, s"bin counting must be partial+final:\n$p")
    assert(!p.contains("CartesianProduct"))
    // the global [lo,hi] bounds are a one-row broadcast, not a shuffle
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the one-row bounds should broadcast:\n$p")
  }

  test("p59: both the truth and candidate joins are hash equi-joins") {
    val p = plan("p59_lsh_dedup_recall")
    assert(!p.contains("CartesianProduct"), s"p59 has a cartesian:\n$p")
    // truth side joins on md5(shingle); candidate side on (band, bkey);
    // metric join on (doc_a, doc_b) — every join has an equi-key
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), s"no equi-join found:\n$p")
  }

  test("p60: funnel is one scan + one partial-then-final aggregation") {
    val p = plan("p60_curation_funnel")
    // one Location line per distinct scan (the formatted tree + detail
    // sections both repeat the "Scan parquet" label for a single scan)
    val scans = p.linesIterator.count(_.contains("Location: InMemoryFileIndex"))
    assert(scans == 1, s"funnel must read documents exactly once:\n$p")
    val hashAggs = p.linesIterator.count(_.contains("HashAggregate"))
    assert(hashAggs >= 2, s"expected partial+final aggregation:\n$p")
  }

  test("p64: k-means final assignment is join-free (centroids fold as literals)") {
    val p = plan("p64_kmeans_train")
    // the corpus side (embeddings scan -> assignment -> per-cluster agg)
    // must carry no join at all: the only joins allowed are the tiny
    // k-row model/aggregate stitch at the very top
    assert(!p.contains("SortMergeJoin"), s"corpus-side shuffle join:\n$p")
    assert(!p.contains("CartesianProduct"))
    val hashAggs = p.linesIterator.count(_.contains("HashAggregate"))
    assert(hashAggs >= 2, s"cluster stats must partial-aggregate:\n$p")
  }

  test("p66: phash pair join is a band equi-join, never all-pairs") {
    val p = plan("p66_phash_pairs")
    assert(!p.contains("CartesianProduct"), s"all-pairs join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"no equi-key:\n$p")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      s"expected an equi-join on the band key:\n$p")
  }

  test("q42: both full-outer sides aggregate before the join") {
    val p = plan("q42_full_outer_join")
    assert(p.contains("FullOuter"), s"expected a full outer join:\n$p")
    val hashAggs = p.linesIterator.count(_.contains("HashAggregate"))
    assert(hashAggs >= 4, s"each side must partial+final aggregate first:\n$p")
    // the join input is two aggregates over <=|nation| rows, so no
    // fact-table row may reach the join: scans prune to the 3 columns
    val reads = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!reads.contains("c_name") && !reads.contains("s_name"),
      s"scan reads unused columns:\n$reads")
  }

  test("p70: BPE encode is one codegen'd pass; scan prunes to id+text") {
    val p = plan("p70_bpe_encode")
    assert(p.contains("bpecountexpr"), p)
    // per-row projection: no join, no aggregation, the only exchange is
    // the final deterministic sort
    assert(!p.contains("Join"), s"p70 must not join:\n$p")
    assert(!p.contains("HashAggregate"), s"p70 must not aggregate:\n$p")
    val reads = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(reads.contains("doc_id") && reads.contains("text") &&
      !reads.contains("lang") && !reads.contains("source"),
      s"scan must prune to doc_id+text:\n$reads")
  }

  test("p71: vocab-cached BPE broadcasts the type table and partial-aggregates") {
    val p = plan("p71_bpe_vocab_cached")
    // the (word -> token count) type table is vocabulary-sized: it must
    // broadcast back onto the token stream, never shuffle the corpus
    assert(p.contains("BroadcastHashJoin"), s"type table not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus-side shuffle join:\n$p")
    // per-doc sums partial-aggregate map-side before the doc shuffle
    val hashAggs = p.linesIterator.count(_.contains("HashAggregate"))
    assert(hashAggs >= 4, s"expected partial+final aggs (types + docs):\n$p")
  }

  test("p76: per-chunk BPE counts ride the vocab cache — broadcast types, no word shuffle") {
    val p = plan("p76_chunk_pack")
    // same contract as p71, at chunk grain: the distinct-word type
    // table broadcasts onto the posexploded word stream; re-encoding
    // window slices (occurrences x overlap) was the sf10 curve's
    // largest compute line before this plan
    assert(p.contains("BroadcastHashJoin"), s"type table not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus-side shuffle join:\n$p")
    // the per-chunk sums shuffle (doc_id, chunk_id, partial) — the word
    // column must be gone from every exchange
    val exchanges = p.linesIterator.filter(_.contains("Arguments: hashpartitioning"))
    assert(exchanges.forall(!_.contains("word")), s"words shuffle:\n$p")
  }

  test("p73: PCA projection is a literal-folded map stage + one agg shuffle") {
    // the component and centering constant fold in as literals, so the
    // projection must be join-free: one codegen'd dot per row, one
    // exchange for the label groupBy (+ the final order), partial aggs.
    val p = plan("p73_pca_project")
    assert(!p.contains("Join"), s"p73 must not join:\n$p")
    val exchanges = p.linesIterator.count(_.contains(") Exchange"))
    assert(exchanges <= 2, s"projection shuffles more than agg+sort:\n$p")
    val hashAggs = p.linesIterator.count(_.contains("HashAggregate"))
    assert(hashAggs >= 2, s"label stats not partial-agg'd:\n$p")
  }

  test("p74: chunk planning is a shuffle-free generator stage") {
    // chunking is per-row arithmetic + explode; only the deterministic
    // output sort may exchange. A join or aggregation here would mean
    // the chunker materializes cross-row state — wrong at any scale.
    val p = plan("p74_chunk_plan")
    assert(p.contains("Generate"), s"expected the sequence explode:\n$p")
    assert(!p.contains("Join"), s"p74 must not join:\n$p")
    assert(!p.contains("HashAggregate"), s"p74 must not aggregate:\n$p")
    val exchanges = p.linesIterator.count(_.contains(") Exchange"))
    assert(exchanges <= 1, s"only the output sort may exchange:\n$p")
  }

  test("p78: PQ encoding is join-free (codebook folds as literals)") {
    // the per-subspace nearest-codeword assignment must compile to one
    // codegen'd projection over the corpus scan — a join against a
    // codebook table here would shuffle the corpus at 100 TB for what
    // is driver-side metadata (m x nCode x dim longs).
    val p = plan("p78_pq_encode")
    assert(!p.contains("Join"), s"p78 must not join:\n$p")
    assert(!p.contains("HashAggregate"), s"p78 must not aggregate:\n$p")
    // allowed exchanges: the deliberate Par.widen round-robin (scan
    // parallelism floor) and the deterministic output sort — nothing
    // keyed on data, so neither grows hot at scale
    val exchanges = p.linesIterator.count(_.contains(") Exchange"))
    assert(exchanges <= 2, s"only widen + output sort may exchange:\n$p")
  }

  test("q38: correlated scalar subqueries decorrelate to broadcast agg joins") {
    // both per-custkey aggregates (COUNT, SUM) must come back as
    // partial+final HashAggregates whose results BROADCAST onto orders —
    // a sort-merge or nested-loop here re-shuffles the fact table per
    // subquery and is the regression this test pins against
    val p = plan("q38_correlated_subquery")
    assert(!p.contains("SortMergeJoin"), s"agg side not broadcast:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), s"nested loop in q38:\n$p")
    val bhj = p.linesIterator.count(_.contains(") BroadcastHashJoin"))
    assert(bhj == 2, s"expected 2 broadcast agg joins, got $bhj:\n$p")
  }

  test("q45: EXISTS/NOT EXISTS decorrelate to semi/anti hash joins") {
    // RewritePredicateSubquery must turn both subqueries into one
    // LeftSemi and one LeftAnti hash join — any nested-loop or per-row
    // subquery shape here is quadratic and must fail the build.
    val p = plan("q45_exists_subquery")
    assert(p.contains("LeftSemi"), s"EXISTS not a semi-join:\n$p")
    assert(p.contains("LeftAnti"), s"NOT EXISTS not an anti-join:\n$p")
    // these predicates are equi-correlated, so a broadcast nested-loop
    // (acceptable only for non-correlated subqueries) must not appear
    assert(!p.contains("BroadcastNestedLoopJoin"), s"nested-loop in q45:\n$p")
  }

  test("p80: incremental LSH probe is a band equi-join; survivor agg is partial") {
    // batch-vs-corpus candidates must meet on (band, bkey) hash keys —
    // never a cartesian — and the per-new-doc survivor pick must be a
    // partial-then-final struct-min aggregation, not a global window.
    val p = plan("p80_incremental_lsh")
    assert(!p.contains("CartesianProduct"), s"p80 went cartesian:\n$p")
    assert(!p.contains("Window"), s"survivor pick must not window:\n$p")
    val hashAggs = p.linesIterator.count(_.contains("HashAggregate"))
    assert(hashAggs >= 2, s"survivor min not partial-agg'd:\n$p")
  }

  test("p79: ADC probe broadcasts query LUTs; ranking is bounded top-k") {
    // queries (with their lookup tables) broadcast onto the codes; the
    // corpus side never shuffles for scoring — only the TopK partial
    // buffers exchange.
    val p = plan("p79_pq_adc")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"query side must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus must not shuffle to score:\n$p")
    assert(p.contains("ObjectHashAggregate") || p.contains("HashAggregate"),
      s"expected the TopK partial aggregation:\n$p")
  }

  test("j38: shredded variant collapses to a typed subcolumn with pushdown") {
    // the stored-variant plane at 100 TB: variant_get must read the
    // writer-shredded typed subcolumn (ReadSchema shows a struct with a
    // primitive field, NOT a variant) and the k>50 predicate must reach
    // the parquet scan as a pushed filter on that subcolumn.
    val p = plan("j38_variant_shredded")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("variant"),
      s"variant not shredded in scan schema: $readSchema")
    assert(readSchema.contains("int"),
      s"expected a typed subcolumn in: $readSchema")
    assert(p.contains("PushedFilters:") && p.contains("GreaterThan"),
      s"variant predicate not pushed to the scan:\n$p")
  }

  test("p16b: star-contraction CC never plans a cartesian") {
    // the contraction rounds execute during query construction (each
    // round is pinned + signature-collected); the returned plan is the
    // corpus-sized label-back join — every shape here must be keyed
    val p = plan("p16b_dedup_clusters_star")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"p16b non-equi join:\n$p")
  }

  test("p63/p63b: representative argmax is a partial aggregate, not a cluster window") {
    // VERDICT r13 task 3: row_number over partitionBy(cluster_id)
    // funnelled a whole near-dup cluster through one task — a
    // boilerplate storm serializes there. The argmax is now a
    // max(struct) groupBy: partial aggregation map-side, so per-task
    // rows are bounded by the task's input slice at ANY cluster size.
    for (name <- Seq("p63_cluster_representative", "p63b_representative_boiler")) {
      val p = plan(name)
      assert(!p.contains("Window"),
        s"$name still selects representatives through a window:\n$p")
      assert(!p.contains("SinglePartition"),
        s"$name funnels through one task:\n$p")
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), s"$name non-equi join:\n$p")
      // partial+final pair for the representative aggregate
      val aggs = p.linesIterator.count(l =>
        l.contains("SortAggregate") || l.contains("HashAggregate") ||
          l.contains("ObjectHashAggregate"))
      assert(aggs >= 2, s"$name argmax is not partially aggregated:\n$p")
    }
  }

  test("p87c: repeat DSIR selection reads ONLY the feature artifact, never text") {
    // the standing-corpus path (VERDICT r12 task 7): scoring must scan
    // the persisted (doc, is_t, b, n) table — a plan that still reads
    // documents.parquet (or its text column) re-pays the corpus scan
    // the artifact exists to eliminate
    val p = plan("p87c_dsir_cached")
    assert(!p.contains("documents.parquet"),
      s"p87c re-reads the source corpus:\n$p")
    assert(!p.linesIterator.filter(_.contains("ReadSchema"))
        .exists(_.contains("text")),
      s"p87c scans a text column:\n$p")
    assert(!p.contains("CartesianProduct"))
  }
}
