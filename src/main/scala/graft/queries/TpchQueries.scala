package graft.queries

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Full TPC-H-shaped analytical queries (reference runs all 22 at
 * SF=0.01 and TPC-DS 103/103 at SF=1 — SURVEY §6): multi-join
 * plans adapted to the driver's star-schema column subset. Revenue
 * follows the repo's integer-grid money convention.
 *
 * Scale notes (the shapes the optimizer must produce — see
 * PlanAuditSpec for assertions on the building blocks):
 *  - selective dims join FIRST via broadcast, pruning the fact shuffle;
 *  - date filters push to the parquet scan;
 *  - aggregations are partial/final; top-k is TakeOrderedAndProject.
 */
object TpchQueries extends QueryPack {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q3: shipping-priority — broadcast(filtered customer) prunes
    // orders BEFORE the lineitem shuffle.
    "tpch_q3_shipping_priority" -> ((s, dir) => {
      val cust = Tables.load(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
      val ord = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") < expr("timestamp_ntz'1998-01-01 00:00:00'"))
      val li = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") > expr("timestamp_ntz'1998-01-01 00:00:00'"))
      li.join(ord.join(broadcast(cust), col("o_custkey") === col("c_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 10000)).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // Q5: local-supplier volume — customer and supplier in the SAME
    // nation, nations restricted to one region (broadcast dims).
    "tpch_q5_local_supplier" -> ((s, dir) => {
      val asia = Tables.load(s, dir, "nation")
        .join(broadcast(Tables.load(s, dir, "region").filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val cust = Tables.load(s, dir, "customer").select("c_custkey", "c_nationkey")
      val ord = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= expr("timestamp_ntz'1996-01-01 00:00:00'") &&
                col("o_orderdate") < expr("timestamp_ntz'1998-01-01 00:00:00'"))
        .select("o_orderkey", "o_custkey")
      val supp = Tables.load(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      val li = Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(supp),
          col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(asia), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 10000)).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // Q10: returned-item reporting — top customers by lost revenue.
    "tpch_q10_returned_items" -> ((s, dir) => {
      val cust = Tables.load(s, dir, "customer")
      val nat = Tables.load(s, dir, "nation")
      val ord = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= expr("timestamp_ntz'1997-01-01 00:00:00'") &&
                col("o_orderdate") < expr("timestamp_ntz'1998-01-01 00:00:00'"))
      val li = Tables.load(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 10000)).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    })
  )

  override def oracle: Map[String, String] = Map(
    "tpch_q3_shipping_priority" -> """
      SELECT l_orderkey, o_orderdate, o_orderpriority,
             CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS revenue
      FROM customer, orders, lineitem
      WHERE c_mktsegment = 'BUILDING'
        AND c_custkey = o_custkey AND l_orderkey = o_orderkey
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    "tpch_q5_local_supplier" -> """
      SELECT n_name,
             CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS revenue
      FROM customer, orders, lineitem, supplier, nation, region
      WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        AND r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY n_name ORDER BY revenue DESC, n_name""",
    "tpch_q10_returned_items" -> """
      SELECT c_custkey, c_name, n_name,
             CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS revenue
      FROM customer, orders, lineitem, nation
      WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        AND l_returnflag = 'R' AND c_nationkey = n_nationkey
      GROUP BY c_custkey, c_name, n_name
      ORDER BY revenue DESC, c_custkey LIMIT 20"""
  )
}
