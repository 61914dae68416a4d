package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.operators.DistributedRank

/** Relational operator catalog — SURVEY.md §2.2-2.7 (projections, filters,
  * joins, aggregations, windows, sorts, set ops) re-expressed Spark-first
  * over the typed testdata tables.
  *
  * Scale notes are attached per query; the general rules:
  *  - dimension joins (region/nation/supplier-sized) are broadcast;
  *  - fact-fact joins shuffle on their equi-keys and rely on AQE;
  *  - total orders (global chunk numbering README.md:518, global ranks,
  *    deciles) route through operators/DistributedRank.scala — no
  *    unpartitioned window over a corpus-proportional frame anywhere.
  */
object Relational {

  private val dec = DecimalType(18, 2)
  private def T(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  val entries: Seq[QueryDef] = Seq(

    // ---- A1/A-class aggregation: TPC-H Q1-shaped pricing summary.
    // Partial (map-side) agg then final agg on 2 low-cardinality keys:
    // shuffle carries only |groups| x partitions rows — scales to 100 TB.
    QueryDef(
      "q1_pricing_summary",
      (s, dir) => {
        import s.implicits._
        T(s, dir, "lineitem")
          .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            sum($"l_quantity".cast(dec)).cast("double").as("sum_qty"),
            sum($"l_extendedprice".cast(dec)).cast("double").as("sum_base_price"),
            sum(($"l_extendedprice".cast(dec) *
              (lit(BigDecimal(1)).cast(dec) - $"l_discount".cast(dec))))
              .cast("double").as("sum_disc_price"),
            count(lit(1)).as("count_order"))
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
             |COUNT(*) AS count_order
             |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      "SURVEY §2.4 A1 (README.md:208-213 GROUP BY/COUNT shape) on typed columns"),

    // ---- P-class: projection + filter, pushed to the parquet scan.
    QueryDef(
      "q2_filter_project",
      (s, dir) => {
        import s.implicits._
        T(s, dir, "lineitem")
          .filter($"l_shipdate" < lit("1996-01-01").cast("timestamp") &&
            $"l_quantity" > 48)
          .select($"l_orderkey", $"l_linenumber",
            $"l_extendedprice".as("price"))
          .orderBy($"l_orderkey", $"l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice AS price
             |FROM lineitem
             |WHERE l_shipdate < TIMESTAMP '1996-01-01' AND l_quantity > 48
             |ORDER BY l_orderkey, l_linenumber""".stripMargin),
      "SURVEY §2.2 P3/P5 predicate + projection; PushedFilters on the scan"),

    // ---- J-class: 3-way join, revenue per market segment.
    // Raw lineitem rows never shuffle: revenue partial-aggregates to
    // order grain first (parquet is orderkey-clustered, so the map-side
    // combine cuts the exchange ~4x — |lineitem| rows in, ~|orders|
    // rows out), the orderkey join then carries one row per order, and
    // the custkey side re-aggregates to customer grain before meeting
    // the dimension. Decimal sums regroup associatively, so the
    // two-level aggregation is exact.
    QueryDef(
      "q3_join_revenue",
      (s, dir) => {
        import s.implicits._
        val c = T(s, dir, "customer")
        val o = T(s, dir, "orders")
        val lAgg = T(s, dir, "lineitem")
          .groupBy($"l_orderkey")
          .agg(
            sum(($"l_extendedprice".cast(dec) *
              (lit(BigDecimal(1)).cast(dec) - $"l_discount".cast(dec))))
              .as("__rev"),
            count(lit(1)).as("__n"))
        val perCust = o.join(lAgg, $"o_orderkey" === $"l_orderkey")
          .groupBy($"o_custkey")
          .agg(sum($"__rev").as("__rev"), sum($"__n").as("__n"))
        c.join(perCust, $"c_custkey" === $"o_custkey")
          .groupBy($"c_mktsegment")
          .agg(sum($"__rev").cast("double").as("revenue"),
            sum($"__n").as("n_items"))
          .orderBy($"c_mktsegment")
      },
      Some("""SELECT c_mktsegment,
             |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
             |COUNT(*) AS n_items
             |FROM customer JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON o_orderkey = l_orderkey
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),
      "SURVEY §2.3 equi-joins (generic J2 surface); Catalyst picks SMJ/broadcast"),

    // ---- O-class: global top-k. orderBy+limit compiles to TakeOrdered
    // (per-partition top-k then driver merge) — no full sort at scale.
    QueryDef(
      "q4_topk_orders",
      (s, dir) => {
        import s.implicits._
        T(s, dir, "orders")
          .orderBy($"o_totalprice".desc, $"o_orderkey")
          .limit(10)
          .select($"o_orderkey", $"o_totalprice")
      },
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin),
      "SURVEY §2.6 sorts/limits (top-k); TakeOrderedAndProject physical op"),

    // ---- A3: DISTINCT projection.
    QueryDef(
      "q5_distinct",
      (s, dir) => {
        import s.implicits._
        T(s, dir, "orders").select($"o_orderpriority").distinct()
          .orderBy($"o_orderpriority")
      },
      Some("SELECT DISTINCT o_orderpriority FROM orders ORDER BY o_orderpriority"),
      "SURVEY §2.4 A3 DISTINCT (README.md:226-229 shape)"),

    // ---- W-class: partitioned window — latest order per customer
    // (the reference's per-key last-write-wins shape, SURVEY §T1/T4).
    QueryDef(
      "q6_window_latest",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"o_custkey")
          .orderBy($"o_orderdate".desc, $"o_orderkey".desc)
        T(s, dir, "orders")
          .withColumn("rn", row_number().over(w))
          .filter($"rn" === 1)
          .select($"o_custkey", $"o_orderkey", $"o_totalprice")
          .orderBy($"o_custkey")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice FROM (
             |  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
             |    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders)
             |WHERE rn = 1 ORDER BY o_custkey""".stripMargin),
      "SURVEY §2.5 W1 partitioned variant — scales (hash-partition by key)"),

    // ---- U-class: UNION of two document tables (README.md:664).
    QueryDef(
      "q7_union_tables",
      (s, dir) => {
        import s.implicits._
        val c = T(s, dir, "customer")
          .select($"c_name".as("name"), $"c_acctbal".as("acctbal"))
        val su = T(s, dir, "supplier")
          .select($"s_name".as("name"), $"s_acctbal".as("acctbal"))
        c.unionByName(su).orderBy($"name", $"acctbal")
      },
      Some("""SELECT c_name AS name, c_acctbal AS acctbal FROM customer
             |UNION ALL SELECT s_name AS name, s_acctbal AS acctbal FROM supplier
             |ORDER BY name, acctbal""".stripMargin),
      "SURVEY §2.7 U2 unionByName"),

    // ---- W1 exact shape: ((ROW_NUMBER() OVER (ORDER BY id)-1)/50)+1
    // chunk assignment for _bulk_docs batching (README.md:518) — the
    // arithmetic is verbatim; the global row number comes from the
    // DISTRIBUTED two-phase scan (range partitions + broadcast prefix
    // offsets, operators/DistributedRank.scala), not an unpartitioned
    // window — the corpus-proportional frame never funnels through one
    // task. Only o_orderkey (8 bytes/row) enters the scan.
    QueryDef(
      "q8_bulk_chunks",
      (s, dir) => {
        import s.implicits._
        DistributedRank
          .withRowNumber(
            T(s, dir, "orders").select($"o_orderkey"), "rn")($"o_orderkey")
          .df
          .withColumn("chunk_no",
            (floor(($"rn" - 1) / 50.0) + 1).cast("long"))
          .groupBy($"chunk_no")
          .agg(count(lit(1)).as("n_docs"),
            min($"o_orderkey").as("first_id"),
            max($"o_orderkey").as("last_id"))
          .orderBy($"chunk_no")
      },
      Some("""SELECT chunk_no, COUNT(*) AS n_docs, MIN(o_orderkey) AS first_id,
             |  MAX(o_orderkey) AS last_id FROM (
             |  SELECT o_orderkey, CAST(FLOOR((ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1) / 50.0) + 1 AS BIGINT) AS chunk_no
             |  FROM orders)
             |GROUP BY chunk_no ORDER BY chunk_no""".stripMargin),
      "SURVEY §2.5 W1 — the reference's bulk chunking arithmetic, verbatim semantics"),

    // ---- P7/HAVING: filter on aggregated value (README.md:202,213).
    QueryDef(
      "q9_having",
      (s, dir) => {
        import s.implicits._
        T(s, dir, "customer")
          .groupBy($"c_nationkey")
          .agg(count(lit(1)).as("n_cust"))
          .where($"n_cust" > 20)
          .orderBy($"c_nationkey")
      },
      Some("""SELECT c_nationkey, COUNT(*) AS n_cust FROM customer
             |GROUP BY c_nationkey HAVING COUNT(*) > 20
             |ORDER BY c_nationkey""".stripMargin),
      "SURVEY §2.2 P7 post-aggregation predicate (HAVING)"),

    // ---- A2: bare count (the nagios count-consistency invariant).
    QueryDef(
      "q10_count",
      (s, dir) => T(s, dir, "lineitem").agg(count(lit(1)).as("n")),
      Some("SELECT COUNT(*) AS n FROM lineitem"),
      "SURVEY §2.4 A2 / §5 count invariant (nagios-check:26-27)"),

    // ---- J-class anti join: NOT EXISTS.
    QueryDef(
      "q11_anti_join",
      (s, dir) => {
        import s.implicits._
        T(s, dir, "customer")
          .join(T(s, dir, "orders").filter($"o_orderstatus" === "P"),
            $"c_custkey" === $"o_custkey", "left_anti")
          .select($"c_custkey", $"c_name")
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
             |ORDER BY c_custkey""".stripMargin),
      "anti-join (NOT EXISTS surface); broadcast-able build side at scale"),

    // ---- J-class semi join: EXISTS.
    QueryDef(
      "q12_semi_join",
      (s, dir) => {
        import s.implicits._
        T(s, dir, "part").filter($"p_size" > 45)
          .join(T(s, dir, "lineitem"), $"p_partkey" === $"l_partkey", "left_semi")
          .select($"p_partkey", $"p_name")
          .orderBy($"p_partkey")
      },
      Some("""SELECT p_partkey, p_name FROM part
             |WHERE p_size > 45 AND EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
             |ORDER BY p_partkey""".stripMargin),
      "semi-join (EXISTS surface)"),

    // ---- Broadcast dimension joins: region/nation are tiny at any SF —
    // explicit broadcast() keeps them off the shuffle even at 100 TB facts.
    QueryDef(
      "q13_dim_join",
      (s, dir) => {
        import s.implicits._
        val c = T(s, dir, "customer")
        val n = T(s, dir, "nation")
        val r = T(s, dir, "region")
        c.join(broadcast(n), $"c_nationkey" === $"n_nationkey")
          .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
          .groupBy($"r_name")
          .agg(count(lit(1)).as("n_cust"),
            sum($"c_acctbal".cast(dec)).cast("double").as("total_bal"))
          .orderBy($"r_name")
      },
      Some("""SELECT r_name, COUNT(*) AS n_cust,
             |CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name ORDER BY r_name""".stripMargin),
      "star-schema dim joins; broadcast() hint pins BroadcastHashJoin"),

    // ---- G4: generator over split words + count reduce (the couch view
    // map/emit + _count reduce shape, README.md:184-188).
    QueryDef(
      "q14_explode_count",
      (s, dir) => {
        import s.implicits._
        T(s, dir, "part")
          .select(explode(split($"p_name", " ")).as("word"))
          .groupBy($"word").agg(count(lit(1)).as("cnt"))
          .orderBy($"word")
      },
      Some("""SELECT w AS word, COUNT(*) AS cnt FROM (
             |  SELECT UNNEST(string_split(p_name, ' ')) AS w FROM part)
             |GROUP BY w ORDER BY w""".stripMargin),
      "SURVEY §2.9 G4 explode + A6 _count reduce"),

    // ---- P4: LIKE prefix/infix predicates.
    QueryDef(
      "q15_like",
      (s, dir) => {
        import s.implicits._
        T(s, dir, "part")
          .filter($"p_name".like("%widget%") && $"p_type".like("PROMO%"))
          .select($"p_partkey", $"p_name", $"p_type")
          .orderBy($"p_partkey")
      },
      Some("""SELECT p_partkey, p_name, p_type FROM part
             |WHERE p_name LIKE '%widget%' AND p_type LIKE 'PROMO%'
             |ORDER BY p_partkey""".stripMargin),
      "SURVEY §2.2 P4 LIKE predicates (README.md:103,126,143)"),

    // ---- Time-bucket aggregation over the event stream table (batch
    // analog of a tumbling window; streaming variant in graft.streaming).
    QueryDef(
      "q16_time_buckets",
      (s, dir) => {
        import s.implicits._
        T(s, dir, "events")
          .groupBy(date_trunc("hour", $"ts").as("h"))
          .agg(count(lit(1)).as("n_events"),
            sum($"value".cast(dec)).cast("double").as("total_value"))
          .select($"h".cast("string").as("hour"), $"n_events", $"total_value")
          .orderBy($"hour")
      },
      Some("""SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hour,
             |COUNT(*) AS n_events,
             |CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
             |FROM events GROUP BY 1 ORDER BY hour""".stripMargin),
      "tumbling-window batch analog; event-time bucketing"),

    // ---- Multi-key sort with cast (O2, README.md:142-155 corrected
    // ordering) — rank column materializes the order so the golden
    // compare verifies ordering itself, not just the row set. The rank
    // is the distributed two-phase scan (filtered set is still
    // corpus-proportional): range partitions on the sort keys keep
    // every task's frame bounded at |rows|/nParts.
    QueryDef(
      "q17_multikey_sort",
      (s, dir) => {
        import s.implicits._
        val slim = T(s, dir, "orders").filter($"o_orderstatus" === "F")
          .filter($"o_totalprice" < 10000.0)
          .select($"o_orderkey", $"o_totalprice")
        DistributedRank
          .withRowNumber(slim, "rank_pos")(
            $"o_totalprice".cast(dec), $"o_orderkey")
          .df
          .select($"rank_pos", $"o_orderkey", $"o_totalprice")
          .orderBy($"rank_pos")
      },
      Some("""SELECT ROW_NUMBER() OVER (ORDER BY CAST(o_totalprice AS DECIMAL(18,2)), o_orderkey) AS rank_pos,
             |o_orderkey, o_totalprice
             |FROM orders WHERE o_orderstatus = 'F' AND o_totalprice < 10000.0
             |ORDER BY rank_pos""".stripMargin),
      "SURVEY §2.6 O2 cast + multi-key ORDER BY; rank makes order hash-visible"),

    // ---- ROLLUP: hierarchical subtotals (built-in Catalyst Expand).
    // NULL group keys are coalesced to '(all)' so both engines order
    // and hash them identically.
    QueryDef(
      "q18_rollup",
      (s, dir) => {
        import s.implicits._
        T(s, dir, "orders")
          .rollup($"o_orderstatus", $"o_orderpriority")
          .agg(count(lit(1)).as("n"))
          .select(
            coalesce($"o_orderstatus", lit("(all)")).as("status"),
            coalesce($"o_orderpriority", lit("(all)")).as("priority"),
            $"n")
          .orderBy($"status", $"priority")
      },
      Some("""SELECT COALESCE(o_orderstatus, '(all)') AS status,
             |COALESCE(o_orderpriority, '(all)') AS priority, COUNT(*) AS n
             |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
             |ORDER BY status, priority""".stripMargin),
      "grouping-sets surface (SURVEY §2.4 note): ROLLUP subtotals via Expand"),

    // ---- INTERSECT (set semantics).
    QueryDef(
      "q19_intersect",
      (s, dir) => {
        import s.implicits._
        T(s, dir, "customer").select($"c_nationkey".as("nationkey"))
          .intersect(T(s, dir, "supplier").select($"s_nationkey".as("nationkey")))
          .orderBy($"nationkey")
      },
      Some("""SELECT c_nationkey AS nationkey FROM customer
             |INTERSECT SELECT s_nationkey AS nationkey FROM supplier
             |ORDER BY nationkey""".stripMargin),
      "SURVEY §2.7 set ops: INTERSECT (distinct semantics)"),

    // ---- EXCEPT (set semantics).
    QueryDef(
      "q20_except",
      (s, dir) => {
        import s.implicits._
        T(s, dir, "nation").select($"n_nationkey".as("nationkey"))
          .except(T(s, dir, "supplier").select($"s_nationkey".as("nationkey")))
          .orderBy($"nationkey")
      },
      Some("""SELECT n_nationkey AS nationkey FROM nation
             |EXCEPT SELECT s_nationkey AS nationkey FROM supplier
             |ORDER BY nationkey""".stripMargin),
      "SURVEY §2.7 set ops: EXCEPT (distinct semantics)"),

    // ---- SQL surface with CTE: the reference's query plane IS SQL
    // (README.md:194-202 view-as-CTE shape); spark.sql over registered
    // views, Catalyst parses/optimizes identically to the DataFrame API.
    QueryDef(
      "q21_sql_cte",
      (s, dir) => {
        graft.Tables.registerAll(s, dir)
        s.sql("""WITH seg AS (
                |  SELECT c_mktsegment AS m, COUNT(*) AS n,
                |         CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
                |  FROM customer GROUP BY c_mktsegment)
                |SELECT m, n, bal FROM seg WHERE n > 10 ORDER BY m""".stripMargin)
      },
      Some("""WITH seg AS (
             |  SELECT c_mktsegment AS m, COUNT(*) AS n,
             |         CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
             |  FROM customer GROUP BY c_mktsegment)
             |SELECT m, n, bal FROM seg WHERE n > 10 ORDER BY m""".stripMargin),
      "CTE via spark.sql (README.md:194-202); SQL and DataFrame planes share Catalyst"),

    // ---- PIVOT: status columns from rows (explicit value list keeps
    // output schema static — required for a 100 TB plan anyway).
    QueryDef(
      "q22_pivot",
      (s, dir) => {
        import s.implicits._
        T(s, dir, "orders")
          .groupBy($"o_orderpriority")
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(count(lit(1)))
          .na.fill(0L)
          .orderBy($"o_orderpriority")
      },
      Some("""SELECT o_orderpriority,
             |CAST(COALESCE(SUM(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END), 0) AS BIGINT) AS F,
             |CAST(COALESCE(SUM(CASE WHEN o_orderstatus='O' THEN 1 ELSE 0 END), 0) AS BIGINT) AS O,
             |CAST(COALESCE(SUM(CASE WHEN o_orderstatus='P' THEN 1 ELSE 0 END), 0) AS BIGINT) AS P
             |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
      "pivot with explicit values = conditional aggregation; static schema"),

    // ---- Salted skew join: identical result to the plain equi-join
    // (the oracle IS the plain join) but the skewed side fans out over
    // 8 sub-keys — the explicit mitigation when one key dominates.
    QueryDef(
      "q23_skew_salted_join",
      (s, dir) => {
        import s.implicits._
        val l = T(s, dir, "lineitem")
        val p = T(s, dir, "part").select($"p_partkey", $"p_brand")
        graft.operators.SkewJoin.saltedInnerJoin(
          l, p, $"l_partkey" === $"p_partkey",
          salts = 8, saltSource = $"l_orderkey" * 8 + $"l_linenumber")
          .groupBy($"p_brand")
          .agg(count(lit(1)).as("n_items"),
            sum($"l_quantity".cast(DecimalType(18, 2))).cast("double").as("qty"))
          .orderBy($"p_brand")
      },
      Some("""SELECT p_brand, COUNT(*) AS n_items,
             |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |GROUP BY p_brand ORDER BY p_brand""".stripMargin),
      "salting for skew (SURVEY §4 scale discipline); result == plain join"),

    // ---- Exact grouped percentiles: interpolated (percentile ==
    // quantile_cont) and discrete (percentile_approx at max accuracy ==
    // quantile_disc). Sort-based, sum-free -> deterministic across
    // partitionings; NOT the sketch path (approx_percentile at default
    // accuracy trades exactness for mergeable state at scale).
    QueryDef(
      "q24_percentiles",
      (s, dir) => {
        import s.implicits._
        T(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .agg(
            percentile($"l_quantity", lit(0.25)).as("q25"),
            percentile($"l_quantity", lit(0.5)).as("q50"),
            percentile($"l_quantity", lit(0.9)).as("q90"),
            percentile_approx($"l_extendedprice", lit(0.5),
              lit(Int.MaxValue)).as("p50_disc"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |quantile_cont(l_quantity, 0.25) AS q25,
             |quantile_cont(l_quantity, 0.5) AS q50,
             |quantile_cont(l_quantity, 0.9) AS q90,
             |quantile_disc(l_extendedprice, 0.5) AS p50_disc
             |FROM lineitem GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin),
      "exact grouped percentiles: interpolated + discrete median"),

    // ---- Backward as-of join (the time-series join Spark lacks as a
    // built-in; the oracle IS DuckDB's native ASOF JOIN). Each purchase
    // picks up the most recent prior-or-simultaneous view of the same
    // user. Union + key-partitioned running-last — ONE shuffle on
    // user_id, no (left x earlier-right) pair blow-up; see
    // operators/AsOfJoin.scala for the plan rationale.
    QueryDef(
      "q25_asof_join",
      (s, dir) => {
        import s.implicits._
        val e = T(s, dir, "events")
        val p = e.filter($"event_type" === "purchase")
        val v = e.filter($"event_type" === "view")
          .select($"user_id", $"ts", $"event_id")
        graft.operators.AsOfJoin.backward(
          p, v, key = "user_id", leftTime = "ts", rightTime = "ts",
          carry = Seq("event_id", "ts"))
          .select($"event_id", $"user_id",
            $"asof_event_id".as("view_id"),
            (unix_timestamp($"ts") - unix_timestamp($"asof_ts")).as("lag_s"))
          .orderBy($"event_id")
      },
      Some("""WITH p AS (SELECT * FROM events WHERE event_type='purchase'),
             |     v AS (SELECT * FROM events WHERE event_type='view')
             |SELECT p.event_id, p.user_id, v.event_id AS view_id,
             |  date_diff('second', v.ts, p.ts) AS lag_s
             |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.ts <= p.ts
             |ORDER BY p.event_id""".stripMargin),
      "backward as-of join vs DuckDB native ASOF JOIN; union + running-last plan"),

    // ---- Gap-based sessionization (30-min gap): lag + running sum over
    // key-partitioned windows, then a per-session rollup. The batch
    // analog of Structured Streaming's session_window, and the classic
    // event-analytics operator the reference's events table implies.
    QueryDef(
      "q26_sessionize",
      (s, dir) => {
        import s.implicits._
        graft.operators.Sessionize.rollup(
          T(s, dir, "events"), key = "user_id", ts = "ts",
          gapMicros = 1800L * 1000000L,
          flag = $"event_type" === "purchase",
          tiebreak = Seq("event_id"))
          .orderBy($"user_id", $"session_id")
      },
      Some("""WITH e AS (SELECT user_id, ts, event_id, event_type,
             |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
             |         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
             |         THEN 1 ELSE 0 END AS starts
             |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |s AS (SELECT user_id, ts, event_type,
             |    SUM(starts) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS UNBOUNDED PRECEDING) AS session_id FROM e)
             |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
             |  COUNT(*) AS n_events,
             |  date_diff('second', MIN(ts), MAX(ts)) AS duration_s,
             |  CAST(SUM(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
             |FROM s GROUP BY user_id, session_id
             |ORDER BY user_id, session_id""".stripMargin),
      "gap-based sessionization: lag + running sum, per-session rollup"),

    // ---- Range join as a range-frame window: for each purchase, count
    // the same user's views in the preceding hour. The naive plan is an
    // inequality join (every purchase x every earlier view, filtered) —
    // O(n·m) pairs per user. Union + RANGE frame over integer
    // microseconds streams each key group once: ONE shuffle on user_id,
    // no pair materialization, scales like any keyed window.
    QueryDef(
      "q27_range_count",
      (s, dir) => {
        import s.implicits._
        val e = T(s, dir, "events")
        val marked = e.select($"event_id", $"user_id", $"ts",
          unix_micros($"ts").as("__us"),
          when($"event_type" === "view", 1L).otherwise(0L).as("__isView"),
          ($"event_type" === "purchase").as("__isPurchase"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id").orderBy($"__us")
          .rangeBetween(-3600L * 1000000L, -1L)
        marked
          .withColumn("n_views_1h",
            coalesce(sum($"__isView").over(w), lit(0L)))
          .filter($"__isPurchase")
          .select($"event_id", $"user_id", $"n_views_1h")
          .orderBy($"event_id")
      },
      Some("""WITH p AS (SELECT * FROM events WHERE event_type='purchase'),
             |     v AS (SELECT * FROM events WHERE event_type='view')
             |SELECT p.event_id, p.user_id, COUNT(v.event_id) AS n_views_1h
             |FROM p LEFT JOIN v ON v.user_id = p.user_id
             |  AND v.ts >= p.ts - INTERVAL 1 HOUR AND v.ts < p.ts
             |GROUP BY p.event_id, p.user_id
             |ORDER BY p.event_id""".stripMargin),
      "range join via RANGE-frame window (no pair blow-up); oracle is the inequality join")
    ,

    // ---- Global rank buckets: customer spend deciles (ntile) +
    // cumulative distribution. The ranking set is the AGGREGATED
    // customer table (|customers| rows, not |orders|): the sum shuffles
    // partial-agg'd on custkey first. The total order itself is the
    // distributed two-phase scan; ntile/cume_dist are then pure
    // arithmetic on the global rank (DistributedRank.ntileOfRank /
    // cumeDistOfRank) — still one row per customer at 1000 executors,
    // but no single task ever holds the whole ranking set.
    QueryDef(
      "q28_ntile",
      (s, dir) => {
        import s.implicits._
        val tot = T(s, dir, "orders")
          .groupBy($"o_custkey")
          .agg(sum($"o_totalprice".cast(dec)).as("__t"))
        val ranked = DistributedRank
          .withRowNumber(tot, "__rn")($"__t".desc, $"o_custkey")
        ranked.df
          .select($"o_custkey", $"__t".cast("double").as("total_spend"),
            DistributedRank.ntileOfRank($"__rn", ranked.total, 10)
              .as("decile"),
            DistributedRank.cumeDistOfRank($"__rn", ranked.total)
              .as("cume"))
          .orderBy($"o_custkey")
      },
      Some("""WITH t AS (SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS tt
             |  FROM orders GROUP BY o_custkey)
             |SELECT o_custkey, CAST(tt AS DOUBLE) AS total_spend,
             |CAST(NTILE(10) OVER (ORDER BY tt DESC, o_custkey) AS INTEGER) AS decile,
             |CUME_DIST() OVER (ORDER BY tt DESC, o_custkey) AS cume
             |FROM t ORDER BY o_custkey""".stripMargin),
      "customer spend deciles: ntile + cume_dist over the aggregated (small) ranking set"),

    // ---- CUBE: all grouping-set combinations of (returnflag,
    // linestatus) in one pass — Spark expands the sets map-side and
    // partial-aggregates each, so the shuffle still carries only
    // (key-combo, partials). grouping_id() disambiguates subtotal rows
    // (DuckDB: GROUPING() bits composed in the same column order).
    QueryDef(
      "q29_cube",
      (s, dir) => {
        import s.implicits._
        T(s, dir, "lineitem")
          .cube($"l_returnflag", $"l_linestatus")
          .agg(grouping_id().cast("long").as("gid"),
            count(lit(1)).as("n"),
            sum($"l_quantity".cast(dec)).cast("double").as("sum_qty"))
          .select($"gid",
            coalesce($"l_returnflag", lit("ALL")).as("returnflag"),
            coalesce($"l_linestatus", lit("ALL")).as("linestatus"),
            $"n", $"sum_qty")
          .orderBy($"gid", $"returnflag", $"linestatus")
      },
      Some("""SELECT CAST(2*GROUPING(l_returnflag) + GROUPING(l_linestatus) AS BIGINT) AS gid,
             |COALESCE(l_returnflag, 'ALL') AS returnflag,
             |COALESCE(l_linestatus, 'ALL') AS linestatus,
             |COUNT(*) AS n,
             |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
             |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
             |ORDER BY gid, returnflag, linestatus""".stripMargin),
      "CUBE grouping sets with grouping_id disambiguation (one pass, partial-agg'd)"),

    // ---- ROWS-frame moving average: per-user 4-event sliding mean.
    // Values are quantized to integer micro-units BEFORE the frame sum
    // (order-free, engine-exact); ONE shuffle on user_id, each user's
    // frame slides in parallel.
    QueryDef(
      "q30_moving_avg",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
          .rowsBetween(-3, 0)
        T(s, dir, "events")
          .select($"event_id", $"user_id",
            round($"value" * lit(1e6)).cast("long").as("__vq"), $"ts")
          .select($"event_id", $"user_id",
            (sum($"__vq").over(w).cast("double") / lit(1e6) /
              count(lit(1)).over(w).cast("double")).as("moving_avg"))
          .orderBy($"event_id")
      },
      Some("""WITH q AS (SELECT event_id, user_id, ts,
             |  CAST(round(value * 1000000.0) AS BIGINT) AS vq FROM events)
             |SELECT event_id, user_id,
             |CAST(SUM(vq) OVER w AS DOUBLE) / 1000000.0 / CAST(COUNT(*) OVER w AS DOUBLE) AS moving_avg
             |FROM q WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             |  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
             |ORDER BY event_id""".stripMargin),
      "per-user sliding mean over a ROWS frame, micro-unit-quantized for exact cross-engine sums"),

    // ---- dense_rank + lead: within-nation balance leaderboard with the
    // gap to the next customer below. One shuffle on the partition key;
    // raw parquet doubles compare and subtract identically cross-engine.
    QueryDef(
      "q31_dense_rank_lead",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"c_nationkey")
          .orderBy($"c_acctbal".desc, $"c_custkey")
        T(s, dir, "customer")
          .select($"c_custkey", $"c_nationkey", $"c_acctbal",
            dense_rank().over(w).as("drank"),
            ($"c_acctbal" - lead($"c_acctbal", 1).over(w)).as("gap_below"))
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey, c_nationkey, c_acctbal,
             |CAST(DENSE_RANK() OVER w AS INTEGER) AS drank,
             |c_acctbal - LEAD(c_acctbal, 1) OVER w AS gap_below
             |FROM customer WINDOW w AS (PARTITION BY c_nationkey
             |  ORDER BY c_acctbal DESC, c_custkey)
             |ORDER BY c_custkey""".stripMargin),
      "dense_rank + lead gap within nation partitions (O1/W-class window coverage)"),

    // ---- Co-located fact-fact join over a bucketed layout: both sides
    // written ONCE bucketed by orderkey (same bucket count), so the join
    // itself needs NO exchange — each bucket pair joins locally. The
    // write-once/join-many batch analog of the persisted ANN index;
    // PlanSpec pins that no shuffle carries the join key.
    QueryDef(
      "q32_bucketed_join",
      (s, dir) => {
        import s.implicits._
        val o = T(s, dir, "orders").select($"o_orderkey", $"o_orderpriority")
        val l = T(s, dir, "lineitem")
          .select($"l_orderkey", $"l_extendedprice", $"l_discount")
        val (ot, op) = graft.operators.Bucketing.layoutFor(
          dir, "orders", "o_orderkey", 8, o.columns.toSeq)
        val (lt, lp) = graft.operators.Bucketing.layoutFor(
          dir, "lineitem", "l_orderkey", 8, l.columns.toSeq)
        graft.operators.Bucketing.ensureBucketed(s, o, ot, op, "o_orderkey", 8)
        graft.operators.Bucketing.ensureBucketed(s, l, lt, lp, "l_orderkey", 8)
        s.table(ot).join(s.table(lt), $"o_orderkey" === $"l_orderkey")
          .groupBy($"o_orderpriority")
          .agg(
            sum($"l_extendedprice".cast(dec) *
              (lit(BigDecimal(1)).cast(dec) - $"l_discount".cast(dec)))
              .cast("double").as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy($"o_orderpriority")
      },
      Some("""SELECT o_orderpriority,
             |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
             |COUNT(*) AS n_items
             |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
      "revenue by priority over pre-bucketed orders/lineitem: the join side is exchange-free"),

    // ---- Regression + correlation from EXACT sufficient statistics:
    // quantity/price quantized to integer cents, the five sums
    // (n, Σx, Σy, Σxy, Σx², Σy²) kept in DECIMAL(38,0) — exact,
    // order-free, and MERGEABLE (map-side partial agg; two datasets'
    // stats add). Built-in corr()/regr_slope() aggregate doubles and
    // drift across reduction orders; this formulation is bit-stable at
    // any parallelism. Slope/corr are single double expressions over
    // the exact sums at the very end.
    QueryDef(
      "q33_regression",
      (s, dir) => {
        import s.implicits._
        val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
        val xq = round($"l_quantity" * 100).cast(d38)
        val yq = round($"l_extendedprice" * 100).cast(d38)
        T(s, dir, "lineitem")
          .select($"l_returnflag", xq.as("x"), yq.as("y"))
          .groupBy($"l_returnflag")
          .agg(count(lit(1)).cast(d38).as("n"),
            sum($"x").as("sx"), sum($"y").as("sy"),
            sum($"x" * $"y").as("sxy"),
            sum($"x" * $"x").as("sxx"),
            sum($"y" * $"y").as("syy"))
          .select($"l_returnflag",
            $"n".cast("long").as("n_rows"),
            (($"n" * $"sxy" - $"sx" * $"sy").cast("double") /
              ($"n" * $"sxx" - $"sx" * $"sx").cast("double")).as("slope"),
            (($"n" * $"sxy" - $"sx" * $"sy").cast("double") /
              (sqrt(($"n" * $"sxx" - $"sx" * $"sx").cast("double")) *
                sqrt(($"n" * $"syy" - $"sy" * $"sy").cast("double"))))
              .as("corr"))
          .orderBy($"l_returnflag")
      },
      Some("""WITH q AS (SELECT l_returnflag,
             |  CAST(round(l_quantity * 100) AS HUGEINT) AS x,
             |  CAST(round(l_extendedprice * 100) AS HUGEINT) AS y
             |  FROM lineitem),
             |st AS (SELECT l_returnflag, CAST(COUNT(*) AS HUGEINT) AS n,
             |  SUM(x) AS sx, SUM(y) AS sy, SUM(x*y) AS sxy,
             |  SUM(x*x) AS sxx, SUM(y*y) AS syy
             |  FROM q GROUP BY l_returnflag)
             |SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
             |CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE) AS slope,
             |CAST(n*sxy - sx*sy AS DOUBLE) /
             |  (sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) * sqrt(CAST(n*syy - sy*sy AS DOUBLE))) AS corr
             |FROM st ORDER BY l_returnflag""".stripMargin),
      "regression slope + correlation from exact decimal sufficient statistics (mergeable, order-free)"),

    // ---- UNPIVOT (q22's inverse): wide per-flag aggregates melt into
    // (metric, value) rows via the stack generator — a codegen'd
    // projection fan-out over the already-aggregated table, no shuffle
    // beyond the aggregation itself.
    QueryDef(
      "q34_unpivot",
      (s, dir) => {
        import s.implicits._
        T(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .agg(sum($"l_quantity".cast(dec)).cast("double").as("sum_qty"),
            sum($"l_extendedprice".cast(dec)).cast("double").as("sum_price"),
            count(lit(1)).cast("double").as("n_rows"))
          .select($"l_returnflag", expr(
            """stack(3, 'n_rows', n_rows, 'sum_price', sum_price,
              |'sum_qty', sum_qty) AS (metric, value)""".stripMargin))
          .orderBy($"l_returnflag", $"metric")
      },
      Some("""WITH a AS (SELECT l_returnflag,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
             |  CAST(COUNT(*) AS DOUBLE) AS n_rows
             |  FROM lineitem GROUP BY l_returnflag)
             |SELECT l_returnflag, 'n_rows' AS metric, n_rows AS value FROM a
             |UNION ALL SELECT l_returnflag, 'sum_price', sum_price FROM a
             |UNION ALL SELECT l_returnflag, 'sum_qty', sum_qty FROM a
             |ORDER BY l_returnflag, metric""".stripMargin),
      "UNPIVOT via stack: wide aggregates melt to (metric, value) rows, generator fan-out"),

    // ---- Position-aware generator: posexplode keeps each element's
    // ordinal — the head-of-document token view (leading tokens carry
    // the title/boilerplate signal). Pure generator fan-out, position
    // filter applied before anything shuffles.
    QueryDef(
      "q35_posexplode",
      (s, dir) => {
        import s.implicits._
        T(s, dir, "documents")
          .select($"doc_id", posexplode(
            graft.pipeline.TextOps.tokens($"text")).as(Seq("pos", "token")))
          .where($"pos" < 5)
          .orderBy($"doc_id", $"pos")
      },
      Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
             |SELECT doc_id, CAST(r.i - 1 AS INTEGER) AS pos,
             |ws[CAST(r.i AS INTEGER)] AS token
             |FROM w, UNNEST(range(1, len(ws) + 1)) AS r(i)
             |WHERE r.i <= 5 ORDER BY doc_id, pos""".stripMargin),
      "posexplode with ordinal: first-5-token view per document (G-class generator coverage)"),

    // ---- GROUPING SETS with an arbitrary (non-prefix) set list — the
    // general form behind q18's ROLLUP and q29's CUBE: one Expand fans
    // each row into its participating sets, then one ordinary hash agg;
    // GROUPING() distinguishes "NULL because subtotal" from data NULLs.
    QueryDef(
      "q36_grouping_sets",
      (s, dir) => {
        graft.Tables.registerAll(s, dir)
        s.sql("""SELECT COALESCE(o_orderstatus, '(all)') AS status,
                |       COALESCE(o_orderpriority, '(all)') AS priority,
                |       CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_st,
                |       CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_pr,
                |       COUNT(*) AS n
                |FROM orders
                |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                |                        (o_orderpriority), ())
                |ORDER BY status, priority""".stripMargin)
      },
      Some("""SELECT COALESCE(o_orderstatus, '(all)') AS status,
             |COALESCE(o_orderpriority, '(all)') AS priority,
             |CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_st,
             |CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_pr,
             |COUNT(*) AS n
             |FROM orders
             |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
             |                        (o_orderpriority), ())
             |ORDER BY status, priority""".stripMargin),
      "arbitrary GROUPING SETS (non-prefix set list) with GROUPING() markers via one Expand"),

    // ---- Z-order layout key: bit-interleave two join/filter dims into
    // one clustering key. Sorting/partitioning files by z-value bounds
    // BOTH dims within every file, so min/max footer stats prune scans
    // on EITHER predicate — the data-layout move that makes a 100 TB
    // table skippable on two axes at once. The interleave is pure
    // codegen'd integer ops; the per-z-block min/max spans below ARE
    // the skipping index a writer would persist.
    QueryDef(
      "q37_zorder_layout",
      (s, dir) => {
        import s.implicits._
        val bits = 8
        val d = T(s, dir, "lineitem").select(
          ($"l_partkey" % 256).cast("long").as("x"),
          ($"l_suppkey" % 256).cast("long").as("y"))
        val z = (0 until bits).map { b =>
          shiftleft(shiftright($"x", b).bitwiseAND(lit(1L)), 2 * b) +
            shiftleft(shiftright($"y", b).bitwiseAND(lit(1L)), 2 * b + 1)
        }.reduce(_ + _)
        d.withColumn("zv", z)
          .groupBy(expr("zv div 64").as("z_block"))
          .agg(count(lit(1)).as("n"),
            min($"x").as("min_x"), max($"x").as("max_x"),
            min($"y").as("min_y"), max($"y").as("max_y"))
          .orderBy($"z_block")
      },
      Some("""WITH d AS (SELECT l_partkey % 256 AS x, l_suppkey % 256 AS y FROM lineitem),
             |z AS (SELECT x, y, CAST(list_sum(list_transform(range(0, 8),
             |  b -> (((x >> b) & 1) << (2*b)) + (((y >> b) & 1) << (2*b + 1)))) AS BIGINT) AS zv
             |  FROM d)
             |SELECT zv // 64 AS z_block, COUNT(*) AS n,
             |min(x) AS min_x, max(x) AS max_x, min(y) AS min_y, max(y) AS max_y
             |FROM z GROUP BY z_block ORDER BY z_block""".stripMargin),
      "z-order clustering key: bit-interleaved two-dim layout + per-block min/max skipping stats"),

    // ---- Correlated scalar subqueries: orders priced >1.5x their own
    // customer's average. Catalyst decorrelates both subqueries into
    // aggregate-then-join (RewriteCorrelatedScalarSubquery) — the
    // per-row-lookup SQL shape executes as two set-oriented joins, no
    // nested loop. The predicate is integer-exact (cents, and
    // cents*2n > 3*sum instead of a float avg) so no boundary row can
    // flip between engines.
    QueryDef(
      "q38_correlated_subquery",
      (s, dir) => {
        graft.Tables.registerAll(s, dir)
        s.sql("""SELECT o_orderkey, o_custkey
                |FROM orders o
                |WHERE CAST(round(o_totalprice * 100) AS BIGINT) * 2 *
                |  (SELECT COUNT(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
                |  > 3 * (SELECT SUM(CAST(round(o2.o_totalprice * 100) AS BIGINT))
                |         FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
                |ORDER BY o_orderkey""".stripMargin)
      },
      Some("""SELECT o_orderkey, o_custkey
             |FROM orders o
             |WHERE CAST(round(o_totalprice * 100) AS BIGINT) * 2 *
             |  (SELECT COUNT(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
             |  > 3 * (SELECT SUM(CAST(round(o2.o_totalprice * 100) AS BIGINT))
             |         FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
             |ORDER BY o_orderkey""".stripMargin),
      "correlated scalar subqueries decorrelated to joins; integer-exact 1.5x-of-own-average predicate"),

    // ---- Six-way join (TPC-H Q5 shape): local-supplier revenue by
    // nation within one region. The dimension chain (region -> nation
    // -> customer/supplier) broadcasts; only the lineitem⋈orders fact
    // join shuffles — Catalyst's join planning keeps one big exchange
    // however many dims hang off it, and the region filter prunes
    // before anything joins. The c_nationkey = s_nationkey constraint
    // makes it a genuine multi-way plan, not a star of independents.
    QueryDef(
      "q39_multiway_join",
      (s, dir) => {
        import s.implicits._
        val r = T(s, dir, "region").where($"r_name" === "ASIA")
        val n = T(s, dir, "nation")
        val c = T(s, dir, "customer")
        val o = T(s, dir, "orders")
        val l = T(s, dir, "lineitem")
        val sup = T(s, dir, "supplier")
        c.join(o, $"c_custkey" === $"o_custkey")
          .join(l, $"o_orderkey" === $"l_orderkey")
          .join(sup, $"l_suppkey" === $"s_suppkey" &&
            $"c_nationkey" === $"s_nationkey")
          .join(n, $"s_nationkey" === $"n_nationkey")
          .join(r, $"n_regionkey" === $"r_regionkey")
          .groupBy($"n_name")
          .agg(
            sum(($"l_extendedprice".cast(dec) *
              (lit(BigDecimal(1)).cast(dec) - $"l_discount".cast(dec))))
              .cast("double").as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy($"n_name")
      },
      Some("""SELECT n_name,
             |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
             |COUNT(*) AS n_items
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON o_orderkey = l_orderkey
             |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |GROUP BY n_name ORDER BY n_name""".stripMargin),
      "TPC-H Q5-shape six-way join: broadcast dimension chain, one fact-fact shuffle, local-supplier twist"),

    // ---- Interval join with NO equi-key: every event (any user) in
    // the 60 s before each purchase. The declarative form is a pure
    // range predicate, which Catalyst can only nested-loop (O(|A|·|B|));
    // operators/RangeJoin quantizes the axis into width-(hi-lo) buckets
    // so each pair meets on a bucket equi-join (<= 2 probes per left
    // row) and the exact predicate filters after — one fixed-width-key
    // shuffle, linear rows. q27 is the partitioned-window cousin (needs
    // an equi-key to partition by); this is the general case.
    QueryDef(
      "q40_range_join",
      (s, dir) => {
        import s.implicits._
        val e = T(s, dir, "events")
        val purchases = e.where($"event_type" === "purchase")
          .select($"event_id", unix_micros($"ts").as("__p_us"))
        val near = e.select($"event_id".as("__n_id"),
          unix_micros($"ts").as("__n_us"))
        val pairs = graft.operators.RangeJoin.bandJoin(
          purchases, near, $"__p_us", $"__n_us", -60L * 1000000L, 0L)
        purchases
          .join(pairs.groupBy($"event_id").agg(count(lit(1)).as("__cnt")),
            Seq("event_id"), "left")
          .select($"event_id",
            coalesce($"__cnt", lit(0L)).as("n_prev_60s"))
          .orderBy($"event_id")
      },
      Some("""SELECT p.event_id, CAST(COUNT(e.event_id) AS BIGINT) AS n_prev_60s
             |FROM events p LEFT JOIN events e
             |  ON e.ts >= p.ts - INTERVAL 60 SECOND AND e.ts < p.ts
             |WHERE p.event_type = 'purchase'
             |GROUP BY p.event_id ORDER BY p.event_id""".stripMargin),
      "equi-key-free interval join via bucket quantization — no nested loop, one bucket-key shuffle"),

    // ---- Frame-dependent window functions: first/last/nth value and
    // percent_rank over per-customer order history. All windows
    // partition by the customer key (one shuffle, parallel frames);
    // last/nth use an explicit unbounded-both-ends frame because the
    // default frame stops at CURRENT ROW — the classic last_value trap,
    // spelled out identically in the oracle.
    QueryDef(
      "q41_window_frame_fns",
      (s, dir) => {
        import s.implicits._
        val wRun = Window.partitionBy($"o_custkey")
          .orderBy($"o_orderdate", $"o_orderkey")
        val wAll = wRun.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)
        T(s, dir, "orders")
          .where($"o_orderstatus" === "F")
          .select($"o_orderkey", $"o_custkey", $"o_totalprice",
            first($"o_totalprice").over(wAll).as("first_total"),
            last($"o_totalprice").over(wAll).as("last_total"),
            nth_value($"o_totalprice", 2).over(wAll).as("second_total"),
            percent_rank().over(wRun).as("pct_rank"))
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice,
             |first_value(o_totalprice) OVER wa AS first_total,
             |last_value(o_totalprice) OVER wa AS last_total,
             |nth_value(o_totalprice, 2) OVER wa AS second_total,
             |percent_rank() OVER wr AS pct_rank
             |FROM orders WHERE o_orderstatus = 'F'
             |WINDOW wr AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
             |wa AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             |ORDER BY o_orderkey""".stripMargin),
      "first/last/nth_value + percent_rank with explicit unbounded frames, partitioned by customer"),

    // ---- FULL OUTER join: per-nation premium-customer vs premium-
    // supplier counts, where each filtered side covers a different
    // nation subset (one-sided rows are the point of the operator).
    // Aggregate-then-join: both sides reduce to <=|nation| rows BEFORE
    // the join, so the full-outer is over two broadcast-size aggregates
    // however large the fact tables — never join-then-aggregate.
    QueryDef(
      "q42_full_outer_join",
      (s, dir) => {
        import s.implicits._
        val c = T(s, dir, "customer")
          .where($"c_mktsegment" === "BUILDING" && $"c_acctbal" > 9000)
          .groupBy($"c_nationkey".as("nk"))
          .agg(count(lit(1)).as("n_cust"))
        val sup = T(s, dir, "supplier")
          .where($"s_acctbal" > 9000)
          .groupBy($"s_nationkey".as("nk"))
          .agg(count(lit(1)).as("n_supp"))
        c.join(sup, Seq("nk"), "full_outer")
          .select($"nk".as("nationkey"),
            coalesce($"n_cust", lit(0L)).as("n_cust"),
            coalesce($"n_supp", lit(0L)).as("n_supp"))
          .orderBy($"nationkey")
      },
      Some("""SELECT COALESCE(c.nk, s.nk) AS nationkey,
             |CAST(COALESCE(n_cust, 0) AS BIGINT) AS n_cust,
             |CAST(COALESCE(n_supp, 0) AS BIGINT) AS n_supp
             |FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer
             |      WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 9000 GROUP BY 1) c
             |FULL OUTER JOIN (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier
             |      WHERE s_acctbal > 9000 GROUP BY 1) s ON c.nk = s.nk
             |ORDER BY nationkey""".stripMargin),
      "full outer join of two filtered per-nation aggregates; aggregate-then-join keeps both sides broadcast-size"),

    // ---- Array aggregation surface: per-order sorted distinct part
    // set, its cardinality, bounds, and an md5 fingerprint of the
    // joined list (arrays themselves don't hash-compare across engines;
    // the canonical string fingerprint does, and is also what an
    // array-valued column would ship to a dedup/diff step). collect_set
    // partial-aggregates map-side, so the shuffle carries per-order
    // part-id sets, never lineitem rows; the filter prunes at the scan.
    QueryDef(
      "q43_array_agg",
      (s, dir) => {
        import s.implicits._
        T(s, dir, "lineitem")
          .where($"l_orderkey" % 100 === 0)
          .groupBy($"l_orderkey")
          .agg(sort_array(collect_set($"l_partkey")).as("parts"))
          .select($"l_orderkey",
            size($"parts").cast("long").as("n_parts"),
            element_at($"parts", 1).as("first_part"),
            element_at($"parts", -1).as("last_part"),
            md5(array_join(transform($"parts", _.cast("string")), ","))
              .as("parts_md5"))
          .orderBy($"l_orderkey")
      },
      Some("""SELECT l_orderkey,
             |CAST(len(parts) AS BIGINT) AS n_parts,
             |parts[1] AS first_part, parts[-1] AS last_part,
             |md5(array_to_string(parts, ',')) AS parts_md5
             |FROM (SELECT l_orderkey,
             |        list_sort(list(DISTINCT l_partkey)) AS parts
             |      FROM lineitem WHERE l_orderkey % 100 = 0 GROUP BY 1)
             |ORDER BY l_orderkey""".stripMargin),
      "array aggregation: sorted distinct per-group sets with a canonical md5 list fingerprint, DuckDB list-function parity"),

    // ---- Skew diagnostic: the measurement step BEFORE q23's salted
    // join — per-key frequencies for a join key, each hot key's corpus
    // share, and the salt fan-out that would level it to average load
    // (ceil(cnt/avg), integer math so the recommendation is exact and
    // engine-independent). At 100 TB this is the cheap pre-flight that
    // decides between plain AQE and explicit salting: one partial-agg'd
    // key-cardinality-sized aggregation, top-k via TakeOrdered — the
    // fact table is scanned once and only (key, count) pairs shuffle.
    QueryDef(
      "q44_skew_profile",
      (s, dir) => {
        import s.implicits._
        val keys = T(s, dir, "lineitem")
          .groupBy($"l_partkey").agg(count(lit(1)).as("cnt"))
        val tot = keys.agg(sum($"cnt").as("total"),
          count(lit(1)).as("n_keys"))
        keys.crossJoin(broadcast(tot))
          .select($"l_partkey", $"cnt",
            expr("cnt * 1000000 DIV total").as("share_ppm"),
            expr("(cnt + (total DIV n_keys) - 1) DIV (total DIV n_keys)")
              .as("salt_factor"))
          .orderBy($"cnt".desc, $"l_partkey")
          .limit(10)
      },
      Some("""WITH k AS (SELECT l_partkey, COUNT(*) AS cnt
             |  FROM lineitem GROUP BY 1),
             |t AS (SELECT SUM(cnt) AS total, COUNT(*) AS n_keys FROM k)
             |SELECT l_partkey, cnt,
             |  CAST(cnt * 1000000 // total AS BIGINT) AS share_ppm,
             |  CAST((cnt + (total // n_keys) - 1) // (total // n_keys)
             |    AS BIGINT) AS salt_factor
             |FROM k, t ORDER BY cnt DESC, l_partkey LIMIT 10""".stripMargin),
      "join-key skew pre-flight: hot-key shares + exact integer salt-factor recommendation feeding q23's mitigation"),

    // ---- NOT EXISTS / EXISTS pair: Catalyst must decorrelate both into
    // hash anti/semi-joins (RewritePredicateSubquery) — a per-row
    // subquery re-execution would be quadratic at any scale. Plan shape
    // pinned in PlanSpec (q45).
    QueryDef(
      "q45_exists_subquery",
      (s, dir) => {
        graft.Tables.registerAll(s, dir)
        s.sql("""SELECT c_mktsegment, COUNT(*) AS n_quiet
                |FROM customer c
                |WHERE NOT EXISTS (
                |  SELECT 1 FROM orders o
                |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
                |AND EXISTS (
                |  SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
                |GROUP BY c_mktsegment
                |ORDER BY c_mktsegment""".stripMargin)
      },
      Some("""SELECT c_mktsegment, COUNT(*) AS n_quiet
             |FROM customer c
             |WHERE NOT EXISTS (
             |  SELECT 1 FROM orders o
             |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
             |AND EXISTS (
             |  SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
             |GROUP BY c_mktsegment
             |ORDER BY c_mktsegment""".stripMargin),
      "EXISTS + NOT EXISTS decorrelated to semi/anti hash joins — active customers with no large order")
  )
}
