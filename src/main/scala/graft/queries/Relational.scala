package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Det
import graft.sources.Tables

/** Relational coverage queries over the TPC-H-ish fixtures: scans with
  * predicate/projection pushdown (SURVEY.md §2.1-2.2), joins incl. broadcast
  * of small dimensions (§2.3), hash aggregation (§2.4), window functions
  * (§2.5), sort/limit (§2.6), semi/anti joins (§2.7).
  *
  * Every query ends in a deterministic ORDER BY so results hash stably.
  * Additive double aggregates go through [[Det]] for order-independence.
  */
object Relational {

  private val DSUM_DISC =
    "CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,9))) AS VARCHAR) AS DOUBLE)"

  def entries: Seq[Q] = Seq(
    Q("q1_agg", q1Agg _, Some(
      "SELECT l_returnflag, l_linestatus, " +
        "CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,9))) AS VARCHAR) AS DOUBLE) AS sum_qty, " +
        "CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,9))) AS VARCHAR) AS DOUBLE) AS sum_base_price, " +
        s"$DSUM_DISC AS sum_disc_price, " +
        "CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(38,9))) AS VARCHAR) AS DOUBLE) AS sum_charge, " +
        "CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,9))) AS VARCHAR) AS DOUBLE) / count(l_quantity) AS avg_qty, " +
        "CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,9))) AS VARCHAR) AS DOUBLE) / count(l_extendedprice) AS avg_price, " +
        "count(*) AS count_order " +
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' " +
        "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus")),
    Q("q3_join_topn", q3JoinTopN _, Some(
      "SELECT o_orderkey, o_orderdate, " +
        s"$DSUM_DISC AS revenue " +
        "FROM customer JOIN orders ON c_custkey = o_custkey " +
        "JOIN lineitem ON l_orderkey = o_orderkey " +
        "WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1996-06-30 00:00:00' " +
        "AND l_shipdate > TIMESTAMP '1996-06-30 00:00:00' " +
        "GROUP BY o_orderkey, o_orderdate ORDER BY revenue DESC, o_orderkey LIMIT 10")),
    Q("q_rollup", qRollup _, Some(
      "SELECT l_returnflag, l_linestatus, " +
        "CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,9))) AS VARCHAR) AS DOUBLE) AS sum_qty, " +
        "count(*) AS n " +
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' " +
        "GROUP BY ROLLUP (l_returnflag, l_linestatus) " +
        "ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST")),
    Q("q_broadcast_dims", qBroadcastDims _, Some(
      "SELECT r_name, n_name, " +
        s"$DSUM_DISC AS revenue, count(*) AS n_items " +
        "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey " +
        "JOIN nation ON s_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey " +
        "GROUP BY r_name, n_name ORDER BY r_name, n_name")),
    Q("q_window_running", qWindowRunning _, Some(
      "WITH x AS (SELECT l_suppkey, l_orderkey, l_linenumber, " +
        "row_number() OVER w AS rn, " +
        "CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,9))) OVER " +
        "(PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE) AS running_qty " +
        "FROM lineitem WHERE l_suppkey <= 5 " +
        "WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber)) " +
        "SELECT l_suppkey, l_orderkey, l_linenumber, rn, running_qty FROM x " +
        "ORDER BY l_suppkey, rn")),
    Q("q_sort_limit", qSortLimit _, Some(
      "SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate FROM orders " +
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 15")),
    Q("q_semi_join", qSemiJoin _, Some(
      "SELECT o_orderstatus, count(*) AS n_orders, " +
        "CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,9))) AS VARCHAR) AS DOUBLE) AS sum_price " +
        "FROM orders WHERE EXISTS (SELECT 1 FROM lineitem " +
        "WHERE l_orderkey = o_orderkey AND l_quantity >= 45) " +
        "GROUP BY o_orderstatus ORDER BY o_orderstatus")),
    Q("q_json_extract", qJsonExtract _, Some(
      "SELECT event_type, count(*) AS n, " +
        "CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k, " +
        "min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k, " +
        "max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k " +
        "FROM events GROUP BY event_type ORDER BY event_type")),

    Q("q_anti_join", qAntiJoin _, Some(
      "SELECT c_custkey, c_name, c_mktsegment FROM customer " +
        "WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) " +
        "ORDER BY c_custkey")),

    Q("q_asof_join", qAsofJoin _, Some(
      "WITH e AS (SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, event_type, value FROM events), " +
        "b AS (SELECT user_id, ts_ms, max_by(value, event_id) AS asof_val " +
        "FROM e WHERE event_type = 'purchase' GROUP BY 1, 2), " +
        "p AS (SELECT event_id, user_id, ts_ms, value AS click_val FROM e WHERE event_type = 'click') " +
        "SELECT p.event_id, p.user_id, p.ts_ms, p.click_val, b.ts_ms AS asof_ts_ms, b.asof_val " +
        "FROM p ASOF LEFT JOIN b ON p.user_id = b.user_id AND p.ts_ms >= b.ts_ms " +
        "ORDER BY p.event_id"))
  )

  /** Pricing-summary aggregation (TPC-H Q1 shape): scan + pushed filter +
    * 2-phase hash agg. */
  def q1Agg(t: Tables): DataFrame =
    t.lineitem
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Det.dsum(col("l_quantity")).as("sum_qty"),
        Det.dsum(col("l_extendedprice")).as("sum_base_price"),
        Det.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        Det.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        Det.davg(col("l_quantity")).as("avg_qty"),
        Det.davg(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Hierarchical totals in one pass: `rollup` expands to the grouping-set
    * lattice inside a single hash aggregate (Expand + partial agg — one scan,
    * one shuffle for all three levels, vs a UNION ALL of per-level aggs that
    * re-reads the fact table per level). */
  def qRollup(t: Tables): DataFrame =
    t.lineitem
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(Det.dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** Shipping-priority top-N (TPC-H Q3 shape): 3-way join, agg, top-10.
    * Join keys are the natural distribution keys; AQE picks the join strategy. */
  def q3JoinTopN(t: Tables): DataFrame = {
    val cutoff = lit("1996-06-30").cast("timestamp")
    t.customer.filter(col("c_mktsegment") === "BUILDING")
      .join(t.orders, col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") < cutoff)
      .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") > cutoff)
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(Det.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** Star join with explicitly broadcast small dimensions (region/nation/
    * supplier fit in memory at any scale — at 100 TB the fact table streams,
    * the dims broadcast; no fact-side shuffle before the agg). */
  def qBroadcastDims(t: Tables): DataFrame =
    t.lineitem
      .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(Det.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
           count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))

  /** Window function: per-supplier running revenue ordered by ship date.
    * Shuffles once by supplier; sort within partition only. */
  def qWindowRunning(t: Tables): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    t.lineitem
      .filter(col("l_suppkey") <= 5)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_shipdate"), col("l_quantity").cast(Det.dec).as("qty_dec"))
      .withColumn("running_qty",
        sum(col("qty_dec")).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("double"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("rn"), col("running_qty"))
      .orderBy(col("l_suppkey"), col("rn"))
  }

  /** Global top-K by sort+limit — Spark plans TakeOrderedAndProject (per
    * partition top-K, then K-way driver merge: no global sort at scale). */
  def qSortLimit(t: Tables): DataFrame =
    t.orders
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("o_orderdate"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(15)

  /** EXISTS → left-semi join: orders having any high-quantity line. */
  def qSemiJoin(t: Tables): DataFrame =
    t.orders
      .join(t.lineitem.filter(col("l_quantity") >= 45).select(col("l_orderkey")),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"), Det.dsum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("o_orderstatus"))

  /** Semi-structured extraction: `events.props` is a JSON string column —
    * `get_json_object` path extraction is codegen'd and map-side, the Spark
    * way to project typed fields out of raw JSON event payloads before
    * aggregating (no UDF, no schema inference pass over 100 TB). */
  def qJsonExtract(t: Tables): DataFrame =
    t.events
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  /** NOT EXISTS → left-anti join: customers with no orders. */
  def qAntiJoin(t: Tables): DataFrame =
    t.customer
      .join(t.orders.select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))

  /** As-of join: for every click, the latest purchase by the same user at or
    * before the click. Spark has no ASOF JOIN operator (the oracle uses
    * DuckDB's native one), so this composes it as union + per-user window —
    * ONE shuffle on user_id, no join, no range predicate: build rows sort
    * before probe rows at equal ts (side 0 < 1) so ">=" semantics hold, and
    * `last(..., ignoreNulls)` over the running frame carries the most recent
    * build value forward. Linear in events at any scale; the per-user state
    * is one row — the batch twin of mapGroupsWithState. Build side is
    * pre-deduped per (user_id, ts) via max_by so equal-ts build rows can't
    * make the result order-dependent. */
  def qAsofJoin(t: Tables): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = t.events.withColumn("ts_ms", unix_millis(col("ts")))
    val build = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts_ms"))
      .agg(max_by(col("value"), col("event_id")).as("bval"))
      .select(col("user_id"), col("ts_ms"), lit(0).as("side"),
        lit(null).cast("long").as("event_id"),
        lit(null).cast("double").as("click_val"), col("bval"))
    val probe = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_ms"), lit(1).as("side"),
        col("event_id"), col("value").as("click_val"),
        lit(null).cast("double").as("bval"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"), col("side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    build.unionByName(probe)
      .withColumn("asof_val", last(col("bval"), ignoreNulls = true).over(w))
      .withColumn("asof_ts_ms",
        last(when(col("side") === 0, col("ts_ms")), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id"), col("user_id"), col("ts_ms"), col("click_val"),
        col("asof_ts_ms"), col("asof_val"))
      .orderBy(col("event_id"))
  }
}
