package graft.queries

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Subquery / decorrelation workout (reference: the planner's subquery
 * rule set `plan/rules/logical/FlinkSubQueryRemoveRule.scala` +
 * `SubQueryDecorrelator.java`, proven by its TPC-H/TPC-DS e2e runs
 * `flink-end-to-end-tests/flink-tpcds-test/.../TpcdsTestProgram.java:76`).
 * Four TPC-H subquery shapes, adapted to the driver tables' column
 * subset (no partsupp / receipt dates in the test schema):
 *
 *  - Q2  shape: correlated scalar MAX subquery against the outer row
 *  - Q17 shape: correlated scalar AVG subquery in a predicate
 *  - Q20 shape: IN nested inside an IN's grouped HAVING subquery
 *  - Q21 shape: EXISTS + NOT EXISTS chain on a self-joined fact
 *
 * All four run through `spark.sql` ON PURPOSE: correlated subqueries
 * exercise Catalyst's decorrelation (RewriteCorrelatedScalarSubquery,
 * RewritePredicateSubquery) into aggregate-join / semi-join / anti-join
 * plans — the same rewrite family the reference applies. At 100 TB the
 * decorrelated plans are shuffle joins on the correlation key, never
 * per-row subquery execution; SubquerySpec pins the rewritten shapes.
 *
 * Determinism: quantities are integer-valued doubles (exact sums /
 * avgs), money goes through the integer-cent grid, equality predicates
 * compare stored values without arithmetic.
 */
object SubqueryQueries extends QueryPack {

  private def sql(s: SparkSession, dir: String, tables: Seq[String], q: String): DataFrame = {
    tables.foreach(t => Tables.load(s, dir, t).createOrReplaceTempView(t))
    s.sql(q)
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q2 shape: suppliers holding their nation's maximum account
    // balance — correlated scalar subquery decorrelated to a grouped
    // max joined back on the correlation key.
    "subq_correlated_scalar" -> ((s, dir) => sql(s, dir, Seq("supplier", "nation"), """
      SELECT s_suppkey, s_name, n_name
      FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE s_acctbal = (SELECT max(s2.s_acctbal) FROM supplier s2
                         WHERE s2.s_nationkey = s.s_nationkey)
      ORDER BY s_suppkey""")),

    // Correlated LATERAL derived table with ORDER BY + LIMIT 1 (the
    // reference plans Calcite LATERAL correlates; Spark decorrelates
    // the per-row top-1 rather than executing it per outer row): each
    // January-1997 order paired with its priciest line item.
    "subq_lateral_topk" -> ((s, dir) => sql(s, dir, Seq("orders", "lineitem"), """
      SELECT o.o_orderkey AS orderkey, l.top_part, l.cents
      FROM orders o,
      LATERAL (SELECT l_partkey AS top_part,
                      CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents
               FROM lineitem
               WHERE l_orderkey = o.o_orderkey
               ORDER BY cents DESC, l_partkey LIMIT 1) l
      WHERE o.o_orderdate >= TIMESTAMP_NTZ'1997-01-01 00:00:00'
        AND o.o_orderdate < TIMESTAMP_NTZ'1997-02-01 00:00:00'
      ORDER BY orderkey""")),

    // Q17 shape: small-quantity-order revenue — correlated scalar AVG
    // subquery per part in the predicate.
    "subq_scalar_avg" -> ((s, dir) => sql(s, dir, Seq("lineitem", "part"), """
      SELECT CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
             count(*) AS n_items
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_brand = 'Brand#1'
        AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
                            WHERE l2.l_partkey = p.p_partkey)""")),

    // Q20 shape: suppliers who shipped a meaningful volume of the
    // named parts — IN over a grouped HAVING subquery that itself
    // nests an IN.
    "subq_nested_in" -> ((s, dir) => sql(s, dir, Seq("supplier", "lineitem", "part"), """
      SELECT s_suppkey, s_name
      FROM supplier
      WHERE s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
        GROUP BY l_suppkey
        HAVING sum(l_quantity) > 2000)
      ORDER BY s_suppkey""")),

    // Q21 shape: suppliers who were the last to ship in multi-supplier
    // finished orders — EXISTS (another supplier in the order) AND NOT
    // EXISTS (another supplier shipped later).
    "subq_exists_chain" -> ((s, dir) => sql(s, dir, Seq("supplier", "lineitem", "orders"), """
      SELECT s_name, count(*) AS numwait
      FROM supplier, lineitem l1, orders
      WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        AND o_orderstatus = 'F'
        AND EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.l_shipdate > l1.l_shipdate)
      GROUP BY s_name
      ORDER BY numwait DESC, s_name"""))
  )

  override def oracle: Map[String, String] = Map(
    "subq_correlated_scalar" -> """
      SELECT s_suppkey, s_name, n_name
      FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE s_acctbal = (SELECT max(s2.s_acctbal) FROM supplier s2
                         WHERE s2.s_nationkey = s.s_nationkey)
      ORDER BY s_suppkey""",
    "subq_lateral_topk" -> """
      SELECT o.o_orderkey AS orderkey, l.top_part, l.cents
      FROM orders o,
      LATERAL (SELECT l_partkey AS top_part,
                      CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents
               FROM lineitem
               WHERE l_orderkey = o.o_orderkey
               ORDER BY cents DESC, l_partkey LIMIT 1) l
      WHERE o.o_orderdate >= TIMESTAMP'1997-01-01 00:00:00'
        AND o.o_orderdate < TIMESTAMP'1997-02-01 00:00:00'
      ORDER BY orderkey""",
    "subq_scalar_avg" -> """
      SELECT CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
             count(*) AS n_items
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_brand = 'Brand#1'
        AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
                            WHERE l2.l_partkey = p.p_partkey)""",
    "subq_nested_in" -> """
      SELECT s_suppkey, s_name
      FROM supplier
      WHERE s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
        GROUP BY l_suppkey
        HAVING sum(l_quantity) > 2000)
      ORDER BY s_suppkey""",
    "subq_exists_chain" -> """
      SELECT s_name, count(*) AS numwait
      FROM supplier, lineitem l1, orders
      WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        AND o_orderstatus = 'F'
        AND EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.l_shipdate > l1.l_shipdate)
      GROUP BY s_name
      ORDER BY numwait DESC, s_name"""
  )
}
