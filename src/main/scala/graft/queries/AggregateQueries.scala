package graft.queries

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Aggregation operators (SURVEY.md §2.4): hash/sort group aggregation,
 * partial/final two-phase agg (Spark does map-side combine
 * automatically), DISTINCT aggregates, HAVING, grouping sets / rollup /
 * cube (Expand), statistical aggregates, min_by/max_by, LISTAGG,
 * COLLECT-as-sorted-set.
 *
 * Mirrors reference exec nodes `BatchExecHashAggregate`,
 * `StreamExecGroupAggregate`, `DecomposeGroupingSetsRule` and the
 * built-in aggregate table (`BuiltInFunctionDefinitions.java:290-386`).
 *
 * Scale notes: every query here is a single hash-aggregate shuffle with
 * map-side partial aggregation; no driver-side collection.
 *
 * Money convention: monetary outputs are floor-quantized to an integer
 * cent grid (`floor(x * 100)` as BIGINT) before summing. floor on a
 * double is IEEE-identical in every engine and BIGINT sums are exact and
 * order-independent at any parallelism — unlike double sums
 * (non-associative) or per-row DECIMAL casts (tie rounding is HALF_UP in
 * Spark but HALF_EVEN in DuckDB). The DuckDB oracle mirrors the same
 * grid; its BIGINT sums are CAST back from HUGEINT.
 */
object AggregateQueries extends QueryPack {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1 shape: multi-aggregate scan → partial agg → final agg.
    "agg_q1_pricing_summary" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") <= expr("timestamp_ntz'1998-09-02 00:00:00'"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(floor(col("l_quantity") * 100)).as("sum_qty"),
          sum(floor(col("l_extendedprice") * 100)).as("sum_base_price"),
          sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 10000)).as("sum_disc_price"),
          sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")) * 10000)).as("sum_charge"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // COUNT(DISTINCT) — Catalyst RewriteDistinctAggregates (Expand-based).
    "agg_count_distinct" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_orderkey")).as("n_orders"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"))
    }),

    // Skew-split COUNT(DISTINCT) (reference SplitAggregateRule): the
    // two-level bucketed rewrite must equal the plain distinct count,
    // proven against the unsplit oracle.
    "agg_count_distinct_split" -> ((s, dir) => {
      graft.operators.SkewAgg.countDistinctSplit(
          Tables.load(s, dir, "lineitem"),
          groupCols = Seq("l_returnflag"), distinctCol = "l_orderkey",
          buckets = 16, outName = "n_orders")
        .orderBy(col("l_returnflag"))
    }),

    // HAVING = filter above aggregate.
    "agg_having" -> ((s, dir) => {
      Tables.load(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(floor(col("o_totalprice") * 100)).as("spend"),
             count(lit(1)).as("n"))
        .filter(col("n") >= 3)
        .orderBy(col("o_custkey"))
    }),

    // ROLLUP → Catalyst Expand node (DecomposeGroupingSetsRule analog).
    "agg_rollup" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(floor(col("l_quantity") * 100)).as("sum_qty"),
             grouping_id().as("gid"))
        .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))
    }),

    // CUBE over two dims.
    "agg_cube" -> ((s, dir) => {
      Tables.load(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), grouping_id().as("gid"))
        .orderBy(col("gid"), col("o_orderstatus"), col("o_orderpriority"))
    }),

    // GROUPING SETS via SQL surface.
    "agg_grouping_sets" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT l_returnflag, l_linestatus,
               count(*) AS n, grouping_id() AS gid
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY gid, l_returnflag, l_linestatus
      """)
    }),

    // Discrete percentiles (reference PERCENTILE family): unlike the
    // interpolating percentile_cont, percentile_disc SELECTS an
    // existing value (smallest with cume_dist >= p), so the result is
    // bit-exact across engines — no rounding needed.
    "agg_percentile_disc" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT l_returnflag,
               percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity) AS med_qty,
               percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity) AS q1_qty,
               percentile_disc(0.9) WITHIN GROUP (ORDER BY l_extendedprice) AS p90_price
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
      """)
    }),

    // Statistical aggregates (STDDEV/VAR family) — rounded: double
    // accumulation order differs across engines/parallelism.
    "agg_stats" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
          round(var_samp(col("l_quantity")), 4).as("var_qty"),
          round(stddev_pop(col("l_discount")), 4).as("sdp_disc"),
          round(var_pop(col("l_discount")), 4).as("varp_disc"),
          round(avg(col("l_extendedprice")), 2).as("avg_price"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"))
        .orderBy(col("l_returnflag"))
    }),

    // min_by / max_by (Flink FIRST_VALUE/LAST_VALUE-by-order analog);
    // deterministic because the ordering value (o_orderkey) is unique.
    "agg_min_max_by" -> ((s, dir) => {
      Tables.load(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(min_by(col("o_totalprice"), col("o_orderkey")).as("first_price"),
             max_by(col("o_totalprice"), col("o_orderkey")).as("last_price"),
             min(col("o_orderkey")).as("min_key"))
        .orderBy(col("o_orderstatus"))
    }),

    // LISTAGG ≈ concat_ws(collect_list) — made deterministic by sorting.
    "agg_listagg" -> ((s, dir) => {
      Tables.load(s, dir, "nation")
        .groupBy(col("n_regionkey"))
        .agg(concat_ws(",", array_sort(collect_list(col("n_name")))).as("nations"))
        .orderBy(col("n_regionkey"))
    }),

    // COLLECT (multiset) — sorted distinct set, emitted as a CSV string
    // (the driver's comparator can't sort array cells; array semantics
    // stay under test in AggregateSpec).
    "agg_collect_set" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(concat_ws(",", array_sort(collect_set(col("l_linestatus")))).as("statuses"),
             size(collect_set(col("l_linestatus"))).cast("bigint").as("n_statuses"))
        .orderBy(col("l_returnflag"))
    }),

    // COLLECT → MULTISET count-map convention (reference COLLECT
    // aggregate, BuiltInFunctionDefinitions.java:290-386): per order,
    // COLLECT(l_linestatus) builds a map<status, int>; CARDINALITY
    // sums multiplicities, element_at looks up one status's count, and
    // ELEMENT projects the sole member of singleton multisets.
    "agg_collect_multiset" -> ((s, dir) => {
      import graft.functions.{Multiset => M}
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(M.collect(col("l_linestatus")).as("ms"))
        .select(col("l_orderkey"),
          M.cardinality(col("ms")).as("card"),
          coalesce(element_at(col("ms"), "O"), lit(0)).as("n_o"),
          coalesce(element_at(col("ms"), "F"), lit(0)).as("n_f"),
          M.element(col("ms")).as("sole"))
        .orderBy(col("l_orderkey"))
    }),

    // SUM0 (Flink: sum defaulting to 0 on empty) — coalesce(sum(..),0).
    "agg_sum0_empty" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem")
        .filter(col("l_quantity") < -1) // empty input group
        .agg(coalesce(sum(floor(col("l_quantity") * 100)), lit(0L)).as("sum0"),
             count(lit(1)).as("n"))
    })
  )

  override def oracle: Map[String, String] = Map(
    "agg_q1_pricing_summary" -> """
      SELECT l_returnflag, l_linestatus,
             CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty,
             CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_price,
             CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS sum_disc_price,
             CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) * 10000) AS BIGINT)) AS BIGINT) AS sum_charge,
             round(avg(l_quantity), 4) AS avg_qty,
             count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",
    "agg_count_distinct_split" -> """
      SELECT l_returnflag, count(DISTINCT l_orderkey) AS n_orders
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "agg_count_distinct" -> """
      SELECT l_returnflag,
             count(DISTINCT l_orderkey) AS n_orders,
             count(DISTINCT l_suppkey) AS n_supps,
             count(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "agg_having" -> """
      SELECT o_custkey,
             CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS spend,
             count(*) AS n
      FROM orders GROUP BY o_custkey HAVING count(*) >= 3 ORDER BY o_custkey""",
    "agg_rollup" -> """
      SELECT l_returnflag, l_linestatus,
             CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty,
             grouping(l_returnflag, l_linestatus) AS gid
      FROM lineitem
      GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY gid, l_returnflag, l_linestatus""",
    "agg_cube" -> """
      SELECT o_orderstatus, o_orderpriority, count(*) AS n,
             grouping(o_orderstatus, o_orderpriority) AS gid
      FROM orders
      GROUP BY CUBE (o_orderstatus, o_orderpriority)
      ORDER BY gid, o_orderstatus, o_orderpriority""",
    "agg_grouping_sets" -> """
      SELECT l_returnflag, l_linestatus, count(*) AS n,
             grouping(l_returnflag, l_linestatus) AS gid
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      ORDER BY gid, l_returnflag, l_linestatus""",
    "agg_percentile_disc" -> """
      SELECT l_returnflag,
             percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity) AS med_qty,
             percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity) AS q1_qty,
             percentile_disc(0.9) WITHIN GROUP (ORDER BY l_extendedprice) AS p90_price
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "agg_stats" -> """
      SELECT l_returnflag,
             round(stddev_samp(l_quantity), 4) AS sd_qty,
             round(var_samp(l_quantity), 4) AS var_qty,
             round(stddev_pop(l_discount), 4) AS sdp_disc,
             round(var_pop(l_discount), 4) AS varp_disc,
             round(avg(l_extendedprice), 2) AS avg_price,
             min(l_quantity) AS min_qty,
             max(l_quantity) AS max_qty
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "agg_min_max_by" -> """
      SELECT o_orderstatus,
             arg_min(o_totalprice, o_orderkey) AS first_price,
             arg_max(o_totalprice, o_orderkey) AS last_price,
             min(o_orderkey) AS min_key
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "agg_listagg" -> """
      SELECT n_regionkey,
             string_agg(n_name, ',' ORDER BY n_name) AS nations
      FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""",
    "agg_collect_multiset" -> """
      SELECT l_orderkey,
             count(*) AS card,
             CAST(count(*) FILTER (l_linestatus = 'O') AS INT) AS n_o,
             CAST(count(*) FILTER (l_linestatus = 'F') AS INT) AS n_f,
             CASE WHEN count(*) = 1 THEN min(l_linestatus) END AS sole
      FROM lineitem
      GROUP BY l_orderkey
      ORDER BY l_orderkey""",
    "agg_collect_set" -> """
      SELECT l_returnflag,
             array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses,
             count(DISTINCT l_linestatus) AS n_statuses
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "agg_sum0_empty" -> """
      SELECT CAST(coalesce(sum(CAST(floor(l_quantity * 100) AS BIGINT)), 0) AS BIGINT) AS sum0,
             count(*) AS n
      FROM lineitem WHERE l_quantity < -1"""
  )
}
