package graft.queries

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * OVER-window / ranking operators (SURVEY.md §2.5-2.6): ranking function
 * family, running and sliding ROWS frames, RANGE frames, LEAD/LAG,
 * FIRST/LAST_VALUE with frames, Top-N per group
 * (reference `FlinkLogicalRankRule` → `StreamExecRank`), keep-first
 * deduplication (reference `StreamExecDeduplicate`), and sorted limit
 * (reference `BatchExecSortLimit` → Spark `TakeOrderedAndProjectExec`).
 *
 * Scale notes: window functions shuffle once on partitionBy keys and
 * sort within partitions (spillable `WindowExec`). Top-N per group never
 * materializes a global sort; the final `orderBy.limit` compiles to
 * TakeOrderedAndProject (per-partition top-k, then k-way driver merge of
 * k rows — not a full collect).
 */
object WindowOverQueries extends QueryPack {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Ranking family; rank/dense_rank tolerate ties, row_number gets a
    // unique (orderkey, linenumber) tiebreak.
    "over_rank_family" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_quantity").desc, col("l_orderkey"), col("l_linenumber"))
      Tables.load(s, dir, "lineitem")
        .filter(col("l_orderkey") <= 200)
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          row_number().over(w).as("rn"),
          round(percent_rank().over(w), 6).as("prnk"),
          ntile(4).over(w).as("quartile"))
        .orderBy(col("l_returnflag"), col("rn"))
    }),

    // Running total: ROWS UNBOUNDED PRECEDING.
    "over_running_sum" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.load(s, dir, "orders")
        .filter(col("o_custkey") <= 100)
        .select(col("o_custkey"), col("o_orderkey"),
          // integer-cent grid (see AggregateQueries money convention)
          sum(floor(col("o_totalprice") * 100)).over(w).as("running_spend"),
          count(lit(1)).over(w).as("running_n"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // Sliding ROWS frame: 2 preceding .. current.
    "over_sliding_rows" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(-2, 0)
      Tables.load(s, dir, "orders")
        .filter(col("o_custkey") <= 100)
        .select(col("o_custkey"), col("o_orderkey"),
          // floor of an exact small-int average: deterministic both engines
          floor(avg(floor(col("o_totalprice") * 100)).over(w)).as("ma3"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // RANGE frame over a numeric ordering column (ties share a frame).
    "over_range_frame" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_quantity"))
        .rangeBetween(-5, 0)
      Tables.load(s, dir, "lineitem")
        .filter(col("l_orderkey") <= 100)
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          count(lit(1)).over(w).as("n_in_range"))
        .orderBy(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"))
    }),

    // LEAD / LAG with defaults.
    "over_lead_lag" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.load(s, dir, "orders")
        .filter(col("o_custkey") <= 100)
        .select(col("o_custkey"), col("o_orderkey"),
          lag(col("o_orderkey"), 1).over(w).as("prev_order"),
          lead(col("o_orderkey"), 1).over(w).as("next_order"),
          lag(col("o_orderkey"), 2, -1L).over(w).as("prev2_or_default"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // IGNORE NULLS navigation (reference planner's LEAD/LAG/LAST_VALUE
    // IGNORE NULLS support, `over/frame/OffsetOverFrame.java` family):
    // last non-null carried forward, previous non-null, first non-null
    // — the gap-filling idiom — over a column NULLed on 'click' rows.
    "over_ignore_nulls" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.load(s, dir, "events")
        .withColumn("v_cents",
          when(col("event_type") === "click", lit(null))
            .otherwise(floor(col("value") * 100).cast("bigint")))
        .select(col("user_id"), col("event_id"),
          last(col("v_cents"), ignoreNulls = true).over(run).as("last_nn"),
          lag(col("v_cents"), 1, null, ignoreNulls = true).over(w).as("prev_nn"),
          first(col("v_cents"), ignoreNulls = true).over(run).as("first_nn"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // FIRST_VALUE / LAST_VALUE over the full partition frame.
    "over_first_last_value" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.load(s, dir, "orders")
        .filter(col("o_custkey") <= 100)
        .select(col("o_custkey"), col("o_orderkey"),
          first(col("o_orderkey")).over(w).as("first_order"),
          last(col("o_orderkey")).over(w).as("last_order"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // Top-N per group (rank-derivation pattern rn <= N).
    "topn_per_group" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      Tables.load(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
          row_number().over(w).as("rn"))
        .filter(col("rn") <= 3)
        .orderBy(col("l_returnflag"), col("rn"))
    }),

    // Keep-first dedup: one row per order (lowest linenumber;
    // (linenumber, partkey, suppkey) is the unique row identity).
    "dedup_keep_first" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
      Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          row_number().over(w).as("rn"))
        .filter(col("rn") === 1)
        .drop("rn")
        .orderBy(col("l_orderkey"))
    }),

    // DISTINCT projection.
    "distinct_projection" -> ((s, dir) =>
      Tables.load(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"))
        .distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    // Sorted limit → TakeOrderedAndProjectExec (no global sort).
    "sort_limit_topk" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select(col("o_orderkey"), col("o_totalprice"))
        .limit(25)),

    // Multi-key sort with explicit null placement (nulls injected).
    "sort_multi_nulls" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        .filter(col("o_orderkey") <= 500)
        .select(col("o_orderkey"),
          when(col("o_orderstatus") === "P", lit(null).cast("string"))
            .otherwise(col("o_orderstatus")).as("status_or_null"),
          col("o_totalprice"))
        .orderBy(col("status_or_null").desc_nulls_last, col("o_orderkey")))
  )

  override def oracle: Map[String, String] = Map(
    "over_rank_family" -> """
      SELECT l_returnflag, l_orderkey, l_linenumber,
             rank() OVER w AS rnk,
             dense_rank() OVER w AS drnk,
             row_number() OVER w AS rn,
             round(percent_rank() OVER w, 6) AS prnk,
             ntile(4) OVER w AS quartile
      FROM lineitem WHERE l_orderkey <= 200
      WINDOW w AS (PARTITION BY l_returnflag
                   ORDER BY l_quantity DESC, l_orderkey, l_linenumber)
      ORDER BY l_returnflag, rn""",
    "over_running_sum" -> """
      SELECT o_custkey, o_orderkey,
             CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) OVER w AS BIGINT) AS running_spend,
             count(*) OVER w AS running_n
      FROM orders WHERE o_custkey <= 100
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      ORDER BY o_custkey, o_orderkey""",
    "over_sliding_rows" -> """
      SELECT o_custkey, o_orderkey,
             CAST(floor(avg(CAST(floor(o_totalprice * 100) AS BIGINT)) OVER w) AS BIGINT) AS ma3
      FROM orders WHERE o_custkey <= 100
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
      ORDER BY o_custkey, o_orderkey""",
    "over_range_frame" -> """
      SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
             count(*) OVER w AS n_in_range
      FROM lineitem WHERE l_orderkey <= 100
      WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_quantity
                   RANGE BETWEEN 5 PRECEDING AND CURRENT ROW)
      ORDER BY l_returnflag, l_orderkey, l_linenumber""",
    "over_lead_lag" -> """
      SELECT o_custkey, o_orderkey,
             lag(o_orderkey, 1) OVER w AS prev_order,
             lead(o_orderkey, 1) OVER w AS next_order,
             lag(o_orderkey, 2, -1) OVER w AS prev2_or_default
      FROM orders WHERE o_custkey <= 100
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      ORDER BY o_custkey, o_orderkey""",
    "over_ignore_nulls" -> """
      WITH e AS (
        SELECT user_id, event_id, ts,
               CASE WHEN event_type = 'click' THEN NULL
                    ELSE CAST(floor(value * 100) AS BIGINT) END AS v_cents
        FROM events)
      SELECT user_id, event_id,
             last_value(v_cents IGNORE NULLS) OVER (PARTITION BY user_id
               ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_nn,
             lag(v_cents, 1 IGNORE NULLS) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS prev_nn,
             first_value(v_cents IGNORE NULLS) OVER (PARTITION BY user_id
               ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_nn
      FROM e
      ORDER BY user_id, event_id""",
    "over_first_last_value" -> """
      SELECT o_custkey, o_orderkey,
             first_value(o_orderkey) OVER w AS first_order,
             last_value(o_orderkey) OVER w AS last_order
      FROM orders WHERE o_custkey <= 100
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY o_custkey, o_orderkey""",
    "topn_per_group" -> """
      SELECT * FROM (
        SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
               row_number() OVER (PARTITION BY l_returnflag
                 ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        FROM lineitem) t
      WHERE rn <= 3 ORDER BY l_returnflag, rn""",
    "dedup_keep_first" -> """
      SELECT l_orderkey, l_linenumber, l_quantity FROM (
        SELECT l_orderkey, l_linenumber, l_quantity,
               row_number() OVER (PARTITION BY l_orderkey
                 ORDER BY l_linenumber, l_partkey, l_suppkey) AS rn
        FROM lineitem) t
      WHERE rn = 1 ORDER BY l_orderkey""",
    "distinct_projection" -> """
      SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
      ORDER BY l_returnflag, l_linestatus""",
    "sort_limit_topk" -> """
      SELECT o_orderkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""",
    "sort_multi_nulls" -> """
      SELECT o_orderkey,
             CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_orderstatus END AS status_or_null,
             o_totalprice
      FROM orders WHERE o_orderkey <= 500
      ORDER BY status_or_null DESC NULLS LAST, o_orderkey"""
  )
}
