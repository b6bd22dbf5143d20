package graft.queries

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * TPC-DS pack 11 — direct gates for the 31 corpus queries previously
 * covered only as "family" variants of a gated pattern, completing
 * per-query direct coverage of the reference's 99-query corpus
 * (`flink-end-to-end-tests/flink-tpcds-test/.../TpcdsTestProgram.java:76-85`).
 * Several TPC-DS queries are near-twins by construction (Q42/Q52/Q55
 * differ by grouping column and filter; Q62/Q99 by channel) — their
 * direct gates are faithfully near-twins too, each keeping its own
 * query's defining measure set, filter, and grouping.
 *
 * Same conventions as TpcdsShapeQueries: channel proxies (l_linestatus
 * 'F' = store, 'O' = web, l_returnflag 'R' = returns; part = item;
 * supplier nation = warehouse/store geography), the integer-cent /
 * basis-point grid for money (floor(x*100) / floor(x*10000) in
 * BIGINT), integer-division averages, cross-multiplied ratio
 * thresholds, `@TS` / `@IDIV` dual-dialect expansion, and every output
 * column CAST to an engine-stable type.
 *
 * Scale notes: every gate is an equi-join star or a window over a
 * grouped frame; the only non-equi join (Q84's income-band range join)
 * probes a 5-row literal dim (broadcast nested-loop by construction);
 * correlated scalars (Q32/Q81) decorrelate into aggregate self-joins
 * keyed on the correlation column; the Q50 self-join is an equi-join
 * on l_orderkey with per-order bounded fan-out.
 */
object TpcdsShapeQueries2 extends QueryPack {

  private def sql(s: SparkSession, dir: String, tables: Seq[String], q: String): DataFrame = {
    tables.foreach(t => Tables.load(s, dir, t).createOrReplaceTempView(t))
    s.sql(q)
  }

  private def spark(t: String): String =
    t.replace("@TS", "TIMESTAMP_NTZ").replace("@IDIV", "div")
  private def duck(t: String): String =
    t.replace("@TS", "TIMESTAMP").replace("@IDIV", "//")

  // Q12: web-channel revenue share within item class over a 30-day
  // window — date-sliced channel scan → grouped item revenue → window
  // share-of-class, ppm integer ratio.
  private val q12 = """
      WITH rev AS (
        SELECT p.p_type, p.p_brand,
               CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE l.l_linestatus = 'O'
          AND l.l_shipdate >= @TS'1997-03-01 00:00:00'
          AND l.l_shipdate < @TS'1997-03-31 00:00:00'
        GROUP BY 1, 2)
      SELECT p_type, p_brand, cents,
             (cents * 1000000) @IDIV CAST(sum(cents) OVER (PARTITION BY p_type) AS BIGINT) AS share_ppm
      FROM rev
      ORDER BY p_type, p_brand"""

  // Q16: catalog ship-confirmation — orders in a 60-day window from a
  // geography list, shipped by MORE THAN ONE supplier (EXISTS over an
  // inequality self-join of the fact, the cs1/cs2 warehouse shape)
  // with no returned line (NOT EXISTS), one summary row.
  private val q16 = """
      SELECT CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
             CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      WHERE o.o_orderdate >= @TS'1996-01-01 00:00:00'
        AND o.o_orderdate < @TS'1996-03-01 00:00:00'
        AND n.n_name IN ('NATION_3', 'NATION_9', 'NATION_14', 'NATION_20')
        AND EXISTS (SELECT 1 FROM lineitem l1
                    JOIN lineitem l2 ON l1.l_orderkey = l2.l_orderkey
                                    AND l1.l_suppkey <> l2.l_suppkey
                    WHERE l1.l_orderkey = o.o_orderkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3
                        WHERE l3.l_orderkey = o.o_orderkey
                          AND l3.l_returnflag = 'R')"""

  // Q18: FOUR integer-division averages (quantity, price, discount,
  // tax) at every ROLLUP level over (nation, segment) under a
  // birth-month-list analog filter — each subtotal level recomputes
  // its own count, not a re-aggregation of sums.
  private val q18 = """
      SELECT n.n_name, c.c_mktsegment,
             CAST(grouping(n.n_name) + grouping(c.c_mktsegment) AS INT) AS lvl,
             (100 * CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT))
               @IDIV CAST(count(*) AS BIGINT) AS qty_avg_c,
             (CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT))
               @IDIV CAST(count(*) AS BIGINT) AS price_avg_c,
             (CAST(sum(CAST(floor(l.l_discount * 10000) AS BIGINT)) AS BIGINT))
               @IDIV CAST(count(*) AS BIGINT) AS disc_avg_bp,
             (CAST(sum(CAST(floor(l.l_tax * 10000) AS BIGINT)) AS BIGINT))
               @IDIV CAST(count(*) AS BIGINT) AS tax_avg_bp,
             CAST(count(*) AS BIGINT) AS n
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      WHERE l.l_linestatus = 'O' AND month(o.o_orderdate) IN (1, 2, 6, 8, 9, 12)
      GROUP BY ROLLUP(n.n_name, c.c_mktsegment)
      ORDER BY lvl, n_name NULLS FIRST, c_mktsegment NULLS FIRST"""

  // Q20: catalog-channel share-of-brand over a 30-day window with an
  // item-type list — Q12's twin on the other channel, share within
  // BRAND (the other hierarchy direction).
  private val q20 = """
      WITH rev AS (
        SELECT p.p_brand, p.p_type,
               CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE l.l_linestatus = 'F'
          AND l.l_shipdate >= @TS'1996-02-01 00:00:00'
          AND l.l_shipdate < @TS'1996-03-02 00:00:00'
          AND p.p_type IN ('ECONOMY', 'STANDARD', 'PROMO')
        GROUP BY 1, 2)
      SELECT p_brand, p_type, cents,
             (cents * 1000000) @IDIV CAST(sum(cents) OVER (PARTITION BY p_brand) AS BIGINT) AS share_ppm
      FROM rev
      ORDER BY p_brand, p_type"""

  // Q25: three-fact chain (sale → later return → later re-purchase by
  // the same (customer, part)) aggregating CENTS per (brand, store
  // nation) with per-leg date windows — Q29's chain with Q25's money
  // measures, grouping dims, and window-per-leg structure.
  private val q25 = """
      WITH s AS (
        SELECT o.o_custkey AS ck, l.l_partkey AS pk, l.l_suppkey AS sk,
               CAST(floor(l.l_extendedprice * 100) AS BIGINT) AS cents, o.o_orderdate AS d
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_linestatus = 'F' AND l.l_returnflag <> 'R'
          AND o.o_orderdate >= @TS'1995-01-01 00:00:00'
          AND o.o_orderdate < @TS'1998-01-01 00:00:00'),
      r AS (
        SELECT o.o_custkey AS ck, l.l_partkey AS pk,
               CAST(floor(l.l_extendedprice * 100) AS BIGINT) AS cents, o.o_orderdate AS d
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_returnflag = 'R'
          AND o.o_orderdate >= @TS'1995-01-01 00:00:00'
          AND o.o_orderdate < @TS'2002-01-01 00:00:00'),
      c AS (
        SELECT o.o_custkey AS ck, l.l_partkey AS pk,
               CAST(floor(l.l_extendedprice * 100) AS BIGINT) AS cents, o.o_orderdate AS d
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_linestatus = 'O'
          AND o.o_orderdate >= @TS'1995-01-01 00:00:00'
          AND o.o_orderdate < @TS'2002-01-01 00:00:00')
      SELECT p.p_brand, sup.s_nationkey AS store_nk,
             CAST(sum(s.cents) AS BIGINT) AS sold_cents,
             CAST(sum(r.cents) AS BIGINT) AS ret_cents,
             CAST(sum(c.cents) AS BIGINT) AS rebuy_cents
      FROM s
      JOIN r ON r.ck = s.ck AND r.pk = s.pk AND r.d >= s.d
      JOIN c ON c.ck = r.ck AND c.pk = r.pk AND c.d >= r.d
      JOIN part p ON p.p_partkey = s.pk
      JOIN supplier sup ON sup.s_suppkey = s.sk
      GROUP BY 1, 2
      ORDER BY p_brand, store_nk"""

  // Q26: catalog-channel demographic averages — Q7's star on the 'O'
  // slice with Q26's four averages and a (balance band, order status)
  // demographic gate.
  private val q26 = """
      SELECT p.p_brand,
             (100 * CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT))
               @IDIV CAST(count(*) AS BIGINT) AS qty_avg_c,
             (CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT))
               @IDIV CAST(count(*) AS BIGINT) AS price_avg_c,
             (CAST(sum(CAST(floor(l.l_discount * 10000) AS BIGINT)) AS BIGINT))
               @IDIV CAST(count(*) AS BIGINT) AS disc_avg_bp,
             (CAST(sum(CAST(floor(l.l_tax * 10000) AS BIGINT)) AS BIGINT))
               @IDIV CAST(count(*) AS BIGINT) AS tax_avg_bp,
             CAST(count(*) AS BIGINT) AS n
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE l.l_linestatus = 'O'
        AND c.c_acctbal BETWEEN 2000 AND 8000
        AND o.o_orderstatus = 'F'
      GROUP BY p.p_brand
      ORDER BY p_brand"""

  // Q32: excess DISCOUNT — lines whose discount exceeds 1.3x the
  // per-part average discount over the SAME 90-day window, via paired
  // correlated scalars (count, sum) on the windowed fact,
  // cross-multiplied on the basis-point grid.
  private val q32 = """
      SELECT CAST(sum(CAST(floor(l.l_discount * 10000) AS BIGINT)) AS BIGINT) AS excess_disc_bp,
             CAST(count(*) AS BIGINT) AS n_excess
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_brand IN ('Brand#11', 'Brand#22', 'Brand#33')
        AND l.l_shipdate >= @TS'1997-05-01 00:00:00'
        AND l.l_shipdate < @TS'1997-07-30 00:00:00'
        AND 10 * CAST(floor(l.l_discount * 10000) AS BIGINT)
              * (SELECT count(*) FROM lineitem l2
                 WHERE l2.l_partkey = l.l_partkey
                   AND l2.l_shipdate >= @TS'1997-05-01 00:00:00'
                   AND l2.l_shipdate < @TS'1997-07-30 00:00:00')
            > 13 * (SELECT sum(CAST(floor(l3.l_discount * 10000) AS BIGINT))
                    FROM lineitem l3
                    WHERE l3.l_partkey = l.l_partkey
                      AND l3.l_shipdate >= @TS'1997-05-01 00:00:00'
                      AND l3.l_shipdate < @TS'1997-07-30 00:00:00')"""

  // Q40: before/after pivot WITH line-level returns netting — the fact
  // LEFT JOINs its returns leg on the business key, the net amount
  // (sale minus matched refund) splits around the pivot date per
  // warehouse nation. Q21's pivot + Q93's netting in one shape, which
  // is exactly Q40's defining structure.
  private val q40 = """
      WITH ret AS (
        SELECT l_orderkey AS ok, l_partkey AS pk,
               CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS ret_cents
        FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1, 2)
      SELECT s.s_nationkey AS nk,
             CAST(sum(CASE WHEN f.l_shipdate < @TS'1997-07-01 00:00:00'
                      THEN CAST(floor(f.l_extendedprice * 100) AS BIGINT) - COALESCE(r.ret_cents, 0)
                      ELSE 0 END) AS BIGINT) AS net_before,
             CAST(sum(CASE WHEN f.l_shipdate >= @TS'1997-07-01 00:00:00'
                      THEN CAST(floor(f.l_extendedprice * 100) AS BIGINT) - COALESCE(r.ret_cents, 0)
                      ELSE 0 END) AS BIGINT) AS net_after
      FROM lineitem f
      LEFT JOIN ret r ON f.l_orderkey = r.ok AND f.l_partkey = r.pk
      JOIN supplier s ON s.s_suppkey = f.l_suppkey
      WHERE f.l_returnflag <> 'R'
        AND f.l_shipdate >= @TS'1997-06-01 00:00:00'
        AND f.l_shipdate < @TS'1997-08-01 00:00:00'
      GROUP BY 1
      ORDER BY nk"""

  // Q42: category revenue for one (year, month) — the canonical star
  // grouped by CATEGORY (vs Q3's brand), single-period slice.
  private val q42 = """
      SELECT CAST(year(l.l_shipdate) AS INT) AS y, p.p_type,
             CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE month(l.l_shipdate) = 11 AND year(l.l_shipdate) = 1996
      GROUP BY 1, 2
      ORDER BY rev_cents DESC, p_type"""

  // Q43: day-of-week pivot per STORE for a single year — seven
  // conditional sums per supplier, one frame, no self-join (vs Q2's
  // year-shifted week compare). Pivot key is the engine-identical
  // modular day index.
  private val q43 = """
      SELECT l_suppkey AS sk,
             CAST(sum(CASE WHEN (dayofyear(l_shipdate) - 1) % 7 = 0 THEN CAST(floor(l_extendedprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS d0_cents,
             CAST(sum(CASE WHEN (dayofyear(l_shipdate) - 1) % 7 = 1 THEN CAST(floor(l_extendedprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS d1_cents,
             CAST(sum(CASE WHEN (dayofyear(l_shipdate) - 1) % 7 = 2 THEN CAST(floor(l_extendedprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS d2_cents,
             CAST(sum(CASE WHEN (dayofyear(l_shipdate) - 1) % 7 = 3 THEN CAST(floor(l_extendedprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS d3_cents,
             CAST(sum(CASE WHEN (dayofyear(l_shipdate) - 1) % 7 = 4 THEN CAST(floor(l_extendedprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS d4_cents,
             CAST(sum(CASE WHEN (dayofyear(l_shipdate) - 1) % 7 = 5 THEN CAST(floor(l_extendedprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS d5_cents,
             CAST(sum(CASE WHEN (dayofyear(l_shipdate) - 1) % 7 = 6 THEN CAST(floor(l_extendedprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS d6_cents
      FROM lineitem
      WHERE l_linestatus = 'F' AND year(l_shipdate) = 1997
      GROUP BY l_suppkey
      ORDER BY sk"""

  // Q48: ONE scalar quantity sum under TWO independent OR-trees ANDed
  // together — (segment × price band) OR'd three ways, (geography list
  // × balance band) OR'd three ways. No grouping output (vs Q13's
  // grouped stats).
  private val q48 = """
      SELECT CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      WHERE ((c.c_mktsegment = 'BUILDING' AND l.l_extendedprice BETWEEN 1000 AND 20000)
          OR (c.c_mktsegment = 'FURNITURE' AND l.l_extendedprice BETWEEN 10000 AND 30000)
          OR (c.c_mktsegment = 'MACHINERY' AND l.l_extendedprice BETWEEN 20000 AND 45000))
        AND ((n.n_name IN ('NATION_1', 'NATION_6', 'NATION_12') AND c.c_acctbal BETWEEN 0 AND 4000)
          OR (n.n_name IN ('NATION_7', 'NATION_15', 'NATION_22') AND c.c_acctbal BETWEEN 2000 AND 7000)
          OR (n.n_name IN ('NATION_3', 'NATION_18', 'NATION_24') AND c.c_acctbal BETWEEN 5000 AND 10000))"""

  // Q50: sale-to-RETURN latency buckets — the fact self-joined (sale
  // line to a later returned line of the same order, equi on
  // l_orderkey with bounded per-order fan-out), interval-comparison
  // buckets per warehouse nation.
  private val q50 = """
      SELECT s.s_nationkey AS nk,
             CAST(sum(CASE WHEN r.l_shipdate < f.l_shipdate + INTERVAL '30' DAY THEN 1 ELSE 0 END) AS BIGINT) AS d30,
             CAST(sum(CASE WHEN r.l_shipdate >= f.l_shipdate + INTERVAL '30' DAY
                            AND r.l_shipdate < f.l_shipdate + INTERVAL '60' DAY THEN 1 ELSE 0 END) AS BIGINT) AS d60,
             CAST(sum(CASE WHEN r.l_shipdate >= f.l_shipdate + INTERVAL '60' DAY
                            AND r.l_shipdate < f.l_shipdate + INTERVAL '90' DAY THEN 1 ELSE 0 END) AS BIGINT) AS d90,
             CAST(sum(CASE WHEN r.l_shipdate >= f.l_shipdate + INTERVAL '90' DAY
                            AND r.l_shipdate < f.l_shipdate + INTERVAL '120' DAY THEN 1 ELSE 0 END) AS BIGINT) AS d120,
             CAST(sum(CASE WHEN r.l_shipdate >= f.l_shipdate + INTERVAL '120' DAY THEN 1 ELSE 0 END) AS BIGINT) AS d_more
      FROM lineitem f
      JOIN lineitem r ON r.l_orderkey = f.l_orderkey
                     AND r.l_returnflag = 'R'
                     AND r.l_shipdate >= f.l_shipdate
      JOIN supplier s ON s.s_suppkey = f.l_suppkey
      WHERE f.l_returnflag <> 'R' AND f.l_linestatus = 'F'
      GROUP BY 1
      ORDER BY nk"""

  // Q52: brand revenue for one (year, month) with NO item-attribute
  // filter — Q42's twin grouped by brand (the corpus's own Q42/Q52/Q55
  // triple differs exactly this way).
  private val q52 = """
      SELECT CAST(year(l.l_shipdate) AS INT) AS y, p.p_brand,
             CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE month(l.l_shipdate) = 12 AND year(l.l_shipdate) = 1996
      GROUP BY 1, 2
      ORDER BY rev_cents DESC, p_brand"""

  // Q53: QUARTERLY manufacturer sales vs the (type, year) average via
  // window sums under a brand-list filter — deviation
  // 10·|n·v − S| > 1·S, all integer (vs Q89's monthly brand form).
  private val q53 = """
      WITH q AS (
        SELECT p.p_type AS ptype, CAST(year(l.l_shipdate) AS INT) AS y,
               CAST(quarter(l.l_shipdate) AS INT) AS qt,
               sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS v
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE year(l.l_shipdate) IN (1996, 1997)
          AND p.p_brand IN ('Brand#3', 'Brand#8', 'Brand#13', 'Brand#18',
                            'Brand#23', 'Brand#28', 'Brand#33', 'Brand#38')
        GROUP BY 1, 2, 3),
      t AS (
        SELECT ptype, y, qt, v,
               CAST(sum(v) OVER (PARTITION BY ptype, y) AS BIGINT) AS ytot,
               CAST(count(*) OVER (PARTITION BY ptype, y) AS BIGINT) AS nq
        FROM q)
      SELECT ptype, y, qt, CAST(v AS BIGINT) AS v, ytot, nq
      FROM t
      WHERE 10 * abs(nq * v - ytot) > ytot
      ORDER BY ptype, y, qt"""

  // Q55: brand revenue for one (manager-proxy month, year) — the third
  // of the Q42/Q52/Q55 triple: brand grouping WITHOUT the year output
  // column, different period.
  private val q55 = """
      SELECT p.p_brand,
             CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE month(l.l_shipdate) = 11 AND year(l.l_shipdate) = 1997
      GROUP BY 1
      ORDER BY rev_cents DESC, p_brand"""

  // Q56: agg over a union of per-channel aggregates restricted to an
  // item LIST via an IN-subquery per leg (the i_color list shape) —
  // vs Q33's direct attribute equality.
  private val q56 = """
      WITH sel AS (SELECT p_partkey AS pk FROM part WHERE p_size IN (5, 17, 29, 41)),
      ss AS (
        SELECT p_brand, sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS total
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_linestatus = 'F' AND l_partkey IN (SELECT pk FROM sel)
        GROUP BY p_brand),
      cs AS (
        SELECT p_brand, sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS total
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_linestatus = 'O' AND l_returnflag <> 'R' AND l_partkey IN (SELECT pk FROM sel)
        GROUP BY p_brand),
      ws AS (
        SELECT p_brand, sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS total
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_returnflag = 'R' AND l_partkey IN (SELECT pk FROM sel)
        GROUP BY p_brand)
      SELECT p_brand, CAST(sum(total) AS BIGINT) AS total_cents
      FROM (SELECT * FROM ss UNION ALL SELECT * FROM cs UNION ALL SELECT * FROM ws) u
      GROUP BY p_brand
      ORDER BY total_cents, p_brand"""

  // Q60: the same union-of-channel-aggregates re-aggregation keyed by
  // CATEGORY with a name-prefix item list (the i_category='Music'
  // variant) — prefix LIKEs in the selecting subquery.
  private val q60 = """
      WITH sel AS (SELECT p_partkey AS pk FROM part
                   WHERE p_name LIKE 'red%' OR p_name LIKE 'hot%'),
      ss AS (
        SELECT p_type, sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS total
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_linestatus = 'F' AND l_partkey IN (SELECT pk FROM sel)
        GROUP BY p_type),
      cs AS (
        SELECT p_type, sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS total
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_linestatus = 'O' AND l_returnflag <> 'R' AND l_partkey IN (SELECT pk FROM sel)
        GROUP BY p_type),
      ws AS (
        SELECT p_type, sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS total
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_returnflag = 'R' AND l_partkey IN (SELECT pk FROM sel)
        GROUP BY p_type)
      SELECT p_type, CAST(sum(total) AS BIGINT) AS total_cents
      FROM (SELECT * FROM ss UNION ALL SELECT * FROM cs UNION ALL SELECT * FROM ws) u
      GROUP BY p_type
      ORDER BY total_cents, p_type"""

  // Q62: WEB ship-latency bands per (warehouse nation, ship-mode
  // proxy) — Q99's bucket mechanics on the other channel with the
  // warehouse dim join (the corpus's own Q62/Q99 pairing).
  private val q62 = """
      SELECT s.s_nationkey AS warehouse_nk, o.o_orderpriority AS ship_mode,
             CAST(sum(CASE WHEN l.l_shipdate < o.o_orderdate + INTERVAL '30' DAY THEN 1 ELSE 0 END) AS BIGINT) AS d30,
             CAST(sum(CASE WHEN l.l_shipdate >= o.o_orderdate + INTERVAL '30' DAY
                            AND l.l_shipdate < o.o_orderdate + INTERVAL '60' DAY THEN 1 ELSE 0 END) AS BIGINT) AS d60,
             CAST(sum(CASE WHEN l.l_shipdate >= o.o_orderdate + INTERVAL '60' DAY
                            AND l.l_shipdate < o.o_orderdate + INTERVAL '90' DAY THEN 1 ELSE 0 END) AS BIGINT) AS d90,
             CAST(sum(CASE WHEN l.l_shipdate >= o.o_orderdate + INTERVAL '90' DAY
                            AND l.l_shipdate < o.o_orderdate + INTERVAL '120' DAY THEN 1 ELSE 0 END) AS BIGINT) AS d120,
             CAST(sum(CASE WHEN l.l_shipdate >= o.o_orderdate + INTERVAL '120' DAY THEN 1 ELSE 0 END) AS BIGINT) AS d_more
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      WHERE l.l_linestatus = 'O' AND year(o.o_orderdate) = 1997
      GROUP BY 1, 2
      ORDER BY warehouse_nk, ship_mode"""

  // Q63: MANAGER (supplier) monthly sales vs the (manager, year)
  // average on the store slice — no lag/lead riders (vs Q57), tighter
  // 10% deviation threshold.
  private val q63 = """
      WITH m AS (
        SELECT l.l_suppkey AS mgr, CAST(year(l.l_shipdate) AS INT) AS y,
               CAST(month(l.l_shipdate) AS INT) AS mo,
               sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS v
        FROM lineitem l
        WHERE l.l_linestatus = 'F' AND year(l.l_shipdate) = 1997
        GROUP BY 1, 2, 3),
      t AS (
        SELECT mgr, y, mo, v,
               CAST(sum(v) OVER (PARTITION BY mgr, y) AS BIGINT) AS ytot,
               CAST(count(*) OVER (PARTITION BY mgr, y) AS BIGINT) AS nmo
        FROM m)
      SELECT mgr, y, mo, CAST(v AS BIGINT) AS v, ytot, nmo
      FROM t
      WHERE 10 * abs(nmo * v - ytot) > ytot
      ORDER BY mgr, y, mo"""

  // Q68: ticket buckets with EXTENDED money measures — per-order
  // price/tax/discount sums (tax and discount on the derived
  // double-product cent grid) under an item-count HAVING band and a
  // date gate, joined back to the customer dim.
  private val q68 = """
      WITH t AS (
        SELECT o.o_orderkey AS okey, o.o_custkey AS ck,
               sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS price_cents,
               sum(CAST(floor((l.l_extendedprice * l.l_tax) * 100) AS BIGINT)) AS tax_cents,
               sum(CAST(floor((l.l_extendedprice * l.l_discount) * 100) AS BIGINT)) AS disc_cents
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE month(o.o_orderdate) IN (1, 2)
        GROUP BY 1, 2
        HAVING count(*) BETWEEN 3 AND 6)
      SELECT c.c_name, t.okey AS o_orderkey,
             CAST(t.price_cents AS BIGINT) AS price_cents,
             CAST(t.tax_cents AS BIGINT) AS tax_cents,
             CAST(t.disc_cents AS BIGINT) AS disc_cents
      FROM t JOIN customer c ON c.c_custkey = t.ck
      ORDER BY c_name, o_orderkey"""

  // Q73: ticket COUNT-band only — frequent small baskets under an
  // order-priority demographic gate, count output with no money
  // measures (the corpus's minimal ticket-bucket form).
  private val q73 = """
      WITH t AS (
        SELECT o.o_orderkey AS okey, o.o_custkey AS ck, count(*) AS n_items
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderpriority IN ('3-MEDIUM', '4-NOT SPECIFIED', '5-LOW')
        GROUP BY 1, 2
        HAVING count(*) BETWEEN 2 AND 4)
      SELECT c.c_name, t.okey AS o_orderkey, CAST(t.n_items AS BIGINT) AS n_items
      FROM t JOIN customer c ON c.c_custkey = t.ck
      ORDER BY c_name, o_orderkey"""

  // Q74: year-over-year preference on QUANTITY with the customer-dim
  // name output — Q11's 4-way self-join with Q74's measure and
  // reduced output column set.
  private val q74 = """
      WITH yr AS (
        SELECT o.o_custkey AS ck, CAST(year(o.o_orderdate) AS INT) AS y,
               l.l_linestatus AS chan,
               sum(CAST(l.l_quantity AS BIGINT)) AS qty
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE year(o.o_orderdate) IN (1996, 1997)
        GROUP BY 1, 2, 3)
      SELECT c.c_name,
             CAST(s1.qty AS BIGINT) AS store_y1, CAST(s2.qty AS BIGINT) AS store_y2,
             CAST(w1.qty AS BIGINT) AS web_y1, CAST(w2.qty AS BIGINT) AS web_y2
      FROM yr s1
      JOIN yr s2 ON s1.ck = s2.ck
      JOIN yr w1 ON s1.ck = w1.ck
      JOIN yr w2 ON s1.ck = w2.ck
      JOIN customer c ON c.c_custkey = s1.ck
      WHERE s1.chan = 'F' AND s1.y = 1996 AND s2.chan = 'F' AND s2.y = 1997
        AND w1.chan = 'O' AND w1.y = 1996 AND w2.chan = 'O' AND w2.y = 1997
        AND s1.qty > 0 AND w1.qty > 0
        AND w2.qty * s1.qty > s2.qty * w1.qty
      ORDER BY c_name"""

  // Q79: per-ticket coupon and net-paid under store (geography) and
  // demographic (priority) gates — the ticket frame keyed to the
  // customer with derived double-product money measures.
  private val q79 = """
      WITH t AS (
        SELECT o.o_orderkey AS okey, o.o_custkey AS ck,
               sum(CAST(floor((l.l_extendedprice * l.l_discount) * 100) AS BIGINT)) AS coupon_cents,
               sum(CAST(floor((l.l_extendedprice * (1.0 - l.l_discount)) * 100) AS BIGINT)) AS net_cents
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        WHERE s.s_nationkey <= 12 AND o.o_orderpriority = '1-URGENT'
        GROUP BY 1, 2)
      SELECT c.c_name, t.okey AS o_orderkey,
             CAST(t.coupon_cents AS BIGINT) AS coupon_cents,
             CAST(t.net_cents AS BIGINT) AS net_cents
      FROM t JOIN customer c ON c.c_custkey = t.ck
      ORDER BY c_name, o_orderkey"""

  // Q80: channel P&L with line-level returns netting and a PROMO
  // anti-filter — each sale LEFT JOINs its returns leg on the business
  // key (vs Q77's agg-level FULL OUTER), promoted items excluded by a
  // NOT IN anti join, ROLLUP totals with profit netting.
  private val q80 = """
      WITH ret AS (
        SELECT l_orderkey AS ok, l_partkey AS pk,
               CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS ret_cents
        FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1, 2),
      chan AS (
        SELECT CASE WHEN f.l_linestatus = 'F' THEN 'store' ELSE 'web' END AS channel,
               s.s_nationkey AS nk,
               CAST(floor(f.l_extendedprice * 100) AS BIGINT) AS sales_cents,
               COALESCE(r.ret_cents, 0) AS ret_cents
        FROM lineitem f
        LEFT JOIN ret r ON f.l_orderkey = r.ok AND f.l_partkey = r.pk
        JOIN supplier s ON s.s_suppkey = f.l_suppkey
        WHERE f.l_returnflag <> 'R'
          AND f.l_partkey NOT IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO'))
      SELECT channel, nk,
             CAST(grouping(channel) + grouping(nk) AS INT) AS lvl,
             CAST(sum(sales_cents) AS BIGINT) AS sales,
             CAST(sum(ret_cents) AS BIGINT) AS returns,
             CAST(sum(sales_cents) - sum(ret_cents) AS BIGINT) AS profit
      FROM chan
      GROUP BY ROLLUP(channel, nk)
      ORDER BY lvl, channel NULLS FIRST, nk NULLS FIRST"""

  // Q81: CATALOG returns above 1.2x the nation average — Q30's paired
  // correlated scalars on the 'O'-slice returns with the geography
  // gate and customer-name output of Q81.
  private val q81 = """
      WITH cr AS (
        SELECT c.c_custkey AS ck, c.c_name AS cname, c.c_nationkey AS nk,
               sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS ret
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        WHERE l.l_returnflag = 'R' AND l.l_linestatus = 'O'
        GROUP BY 1, 2, 3)
      SELECT c1.cname AS c_name, CAST(c1.ret AS BIGINT) AS ret_cents
      FROM cr c1 JOIN nation n ON n.n_nationkey = c1.nk
      WHERE n.n_name IN ('NATION_4', 'NATION_13', 'NATION_19')
        AND c1.ret * (SELECT count(*) FROM cr c2 WHERE c2.nk = c1.nk) * 10
            > (SELECT sum(c2.ret) FROM cr c2 WHERE c2.nk = c1.nk) * 12
      ORDER BY c_name"""

  // Q82: STORE-channel range-sliced items with a quantity-band semi
  // join, emitting the item rows themselves (vs Q37's brand counts) —
  // the corpus's Q37/Q82 pairing differs exactly by channel and band.
  private val q82 = """
      SELECT p.p_name, CAST(floor(p.p_retailprice * 100) AS BIGINT) AS price_cents
      FROM part p
      WHERE p.p_size BETWEEN 10 AND 20
        AND p.p_retailprice BETWEEN 920 AND 960
        AND EXISTS (SELECT 1 FROM lineitem l
                    WHERE l.l_partkey = p.p_partkey AND l.l_linestatus = 'F'
                      AND l.l_quantity BETWEEN 10 AND 30)
      ORDER BY p_name"""

  // Q83: three RETURNS channels re-aggregated over a union, each leg
  // restricted to the ship WEEKS of a seed date window via a nested
  // date subquery (the d_week_seq chain) — quantity measure.
  private val q83 = """
      WITH wks AS (
        SELECT DISTINCT CAST(year(l_shipdate) * 100 + floor((dayofyear(l_shipdate) - 1) / 7) AS INT) AS wk
        FROM lineitem
        WHERE l_shipdate >= @TS'1997-03-01 00:00:00'
          AND l_shipdate < @TS'1997-04-01 00:00:00'),
      sr AS (
        SELECT p_brand, sum(CAST(l_quantity AS BIGINT)) AS qty
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_returnflag = 'R' AND l_linestatus = 'F'
          AND CAST(year(l_shipdate) * 100 + floor((dayofyear(l_shipdate) - 1) / 7) AS INT)
              IN (SELECT wk FROM wks)
        GROUP BY p_brand),
      cr AS (
        SELECT p_brand, sum(CAST(l_quantity AS BIGINT)) AS qty
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_returnflag = 'R' AND l_linestatus = 'O'
          AND CAST(year(l_shipdate) * 100 + floor((dayofyear(l_shipdate) - 1) / 7) AS INT)
              IN (SELECT wk FROM wks)
        GROUP BY p_brand),
      wr AS (
        SELECT p_brand, sum(CAST(l_quantity AS BIGINT)) AS qty
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_returnflag = 'A'
          AND CAST(year(l_shipdate) * 100 + floor((dayofyear(l_shipdate) - 1) / 7) AS INT)
              IN (SELECT wk FROM wks)
        GROUP BY p_brand)
      SELECT p_brand, CAST(sum(qty) AS BIGINT) AS total_qty
      FROM (SELECT * FROM sr UNION ALL SELECT * FROM cr UNION ALL SELECT * FROM wr) u
      GROUP BY p_brand
      ORDER BY p_brand"""

  // Q84: the income-band chain — customers RANGE-joined to a literal
  // band dim (ib_lower/upper analog, a 5-row broadcast nested-loop by
  // construction), city-list gate, and a returned-purchase semi join.
  private val q84 = """
      WITH bands AS (
        SELECT 0 AS band_id, 0.0 AS lo, 2000.0 AS hi
        UNION ALL SELECT 1, 2000.0, 4000.0
        UNION ALL SELECT 2, 4000.0, 6000.0
        UNION ALL SELECT 3, 6000.0, 8000.0
        UNION ALL SELECT 4, 8000.0, 10000.0)
      SELECT c.c_name, b.band_id AS ib_band
      FROM customer c
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN bands b ON c.c_acctbal >= b.lo AND c.c_acctbal < b.hi
      WHERE n.n_name IN ('NATION_6', 'NATION_16')
        AND EXISTS (SELECT 1 FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
                    WHERE o.o_custkey = c.c_custkey AND l.l_returnflag = 'R')
      ORDER BY c_name"""

  // Q86: WEB-channel lochierarchy rank over ROLLUP(type, brand) on a
  // quantity measure — Q36's rank-within-subtotal-level machinery on
  // the other channel, hierarchy direction, and measure.
  private val q86 = """
      SELECT CAST(lochierarchy AS INT) AS lochierarchy, p_type, p_brand, qty, CAST(rk AS INT) AS rk
      FROM (
        SELECT p_type, p_brand, lochierarchy, qty,
               rank() OVER (PARTITION BY lochierarchy, CASE WHEN gb = 0 THEN p_type END
                            ORDER BY qty DESC, p_brand NULLS FIRST, p_type NULLS FIRST) AS rk
        FROM (
          SELECT p_type, p_brand,
                 CAST(grouping(p_type) + grouping(p_brand) AS INT) AS lochierarchy,
                 CAST(grouping(p_brand) AS INT) AS gb,
                 CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE l_linestatus = 'O'
          GROUP BY ROLLUP(p_type, p_brand)) g) t
      ORDER BY lochierarchy DESC, p_type NULLS FIRST, rk"""

  // Q91: call-center returns LOSS under an equality demographic pair
  // gate (the marital×education shape) and a month slice, grouped by
  // (call center, geography).
  private val q91 = """
      SELECT o.o_orderpriority AS call_center, n.n_name,
             CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS loss_cents
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      WHERE l.l_returnflag = 'R' AND month(o.o_orderdate) = 11
        AND ((c.c_mktsegment = 'AUTOMOBILE' AND c.c_acctbal < 3000)
          OR (c.c_mktsegment = 'HOUSEHOLD' AND c.c_acctbal >= 7000))
      GROUP BY 1, 2
      ORDER BY call_center, n_name"""

  // Q14b: the second statement of the corpus's two-part Q14 — the
  // cross-channel item set restricting THIS-period vs LAST-YEAR
  // same-period brand sales, joined with a decline residual (vs
  // Q14a's channel rollup of the same item set).
  private val q14b = """
      WITH cross_items AS (
        SELECT l_partkey AS pk FROM lineitem WHERE l_linestatus = 'F'
        INTERSECT
        SELECT l_partkey FROM lineitem WHERE l_linestatus = 'O' AND l_returnflag <> 'R'
        INTERSECT
        SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'),
      ty AS (
        SELECT p_brand AS brand,
               CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_partkey IN (SELECT pk FROM cross_items)
          AND year(l_shipdate) = 1997 AND month(l_shipdate) = 3
        GROUP BY 1),
      ly AS (
        SELECT p_brand AS brand,
               CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_partkey IN (SELECT pk FROM cross_items)
          AND year(l_shipdate) = 1996 AND month(l_shipdate) = 3
        GROUP BY 1)
      SELECT ty.brand AS brand, ty.cents AS this_year_cents, ly.cents AS last_year_cents
      FROM ty JOIN ly ON ty.brand = ly.brand
      WHERE ty.cents < ly.cents
      ORDER BY ty.brand"""

  // Q23b: the per-customer consumption of Q23a's two grouped-HAVING
  // frames — same frequent-items and best-customers semi joins, final
  // aggregate grouped by the customer dim instead of one summary row.
  private val q23b = """
      WITH frequent_parts AS (
        SELECT l_partkey AS pk FROM lineitem GROUP BY l_partkey HAVING count(*) > 40),
      best_customers AS (
        SELECT o_custkey AS ck FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY o_custkey HAVING sum(l_quantity) > 1200)
      SELECT c.c_name,
             CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sales_cents
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer c ON c.c_custkey = o_custkey
      WHERE o_orderdate >= @TS'1998-01-01 00:00:00'
        AND o_orderdate < @TS'1998-07-01 00:00:00'
        AND l_partkey IN (SELECT pk FROM frequent_parts)
        AND o_custkey IN (SELECT ck FROM best_customers)
      GROUP BY c.c_name
      ORDER BY sales_cents, c_name"""

  // Q24b: the literal-twin second statement of Q24 — the same
  // netpaid-above-average CTE consumed three ways, on the other
  // literal slice ('N'-flag lines) with a 3.0x threshold (the corpus
  // pair differs exactly by one literal).
  private val q24b = """
      WITH paid AS (
        SELECT c.c_custkey AS ck, p.p_type AS pt,
               sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS cents
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE l.l_returnflag = 'N'
        GROUP BY 1, 2)
      SELECT ck AS c_custkey, pt AS p_type, CAST(cents AS BIGINT) AS cents
      FROM paid
      WHERE cents * (SELECT count(*) FROM paid) * 10
            > (SELECT sum(cents) FROM paid) * 30
      ORDER BY ck, pt"""

  // Q39b: the strict second statement of Q39 — the per-period moment
  // stats self-joined on consecutive months, with the FIRST period
  // pinned to January and held to a STRICTER cov test than Q39a's
  // cov² ≥ 1/3: cov > 0.6 ⟺ 25·n·(n·Σq²−S²) > 9·(n−1)·S², the integer
  // cross-multiplied form (the corpus's literal 1.5 can never fire on
  // the synthetic uniform quantity spread, whose cov tops out near
  // 0.64 — the threshold is scaled to keep the strict-vs-base
  // distinction real; second period keeps the Q39a flag).
  private val q39b = """
      WITH stats AS (
        SELECT l_suppkey AS sk, CAST(month(l_shipdate) AS INT) AS mn,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq,
               CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq2
        FROM lineitem
        WHERE l_shipdate >= @TS'1997-01-01 00:00:00'
          AND l_shipdate < @TS'1998-01-01 00:00:00'
        GROUP BY l_suppkey, month(l_shipdate)),
      jan AS (
        SELECT * FROM stats
        WHERE mn = 1 AND n > 1 AND 25 * n * (n * sq2 - sq * sq) > 9 * (n - 1) * sq * sq),
      feb AS (
        SELECT * FROM stats
        WHERE mn = 2 AND n > 1 AND 3 * n * (n * sq2 - sq * sq) >= (n - 1) * sq * sq)
      SELECT j.sk AS suppkey, j.n AS n1, j.sq AS q1, f.n AS n2, f.sq AS q2
      FROM jan j JOIN feb f ON j.sk = f.sk
      ORDER BY suppkey"""

  // Q96: a single half-hour-band count with equality gates — the
  // minimal one-row time-band form (vs Q90's am/pm ratio of two
  // bands).
  private val q96 = """
      SELECT CAST(count(*) AS BIGINT) AS n
      FROM events
      WHERE CAST(extract(hour FROM ts) AS INT) = 20
        AND CAST(extract(minute FROM ts) AS INT) >= 30
        AND event_type = 'view'"""

  private val texts: Map[String, (Seq[String], String)] = Map(
    "tpcds_q12_web_item_share" -> (Seq("lineitem", "part") -> q12),
    "tpcds_q16_catalog_ship" -> (Seq("orders", "customer", "nation", "lineitem") -> q16),
    "tpcds_q18_multi_avg_rollup" -> (Seq("lineitem", "orders", "customer", "nation") -> q18),
    "tpcds_q20_catalog_item_share" -> (Seq("lineitem", "part") -> q20),
    "tpcds_q25_three_fact_profit" -> (Seq("lineitem", "orders", "part", "supplier") -> q25),
    "tpcds_q26_catalog_demo_avg" -> (Seq("lineitem", "orders", "customer", "part") -> q26),
    "tpcds_q32_excess_discount" -> (Seq("lineitem", "part") -> q32),
    "tpcds_q40_returns_pivot" -> (Seq("lineitem", "supplier") -> q40),
    "tpcds_q42_category_month" -> (Seq("lineitem", "part") -> q42),
    "tpcds_q43_dow_store_pivot" -> (Seq("lineitem") -> q43),
    "tpcds_q48_banded_qty_sum" -> (Seq("lineitem", "orders", "customer", "nation") -> q48),
    "tpcds_q50_return_lag_buckets" -> (Seq("lineitem", "supplier") -> q50),
    "tpcds_q52_brand_year" -> (Seq("lineitem", "part") -> q52),
    "tpcds_q53_quarterly_dev" -> (Seq("lineitem", "part") -> q53),
    "tpcds_q55_brand_month" -> (Seq("lineitem", "part") -> q55),
    "tpcds_q56_itemlist_union" -> (Seq("lineitem", "part") -> q56),
    "tpcds_q60_itemname_union" -> (Seq("lineitem", "part") -> q60),
    "tpcds_q62_web_ship_lag" -> (Seq("lineitem", "orders", "supplier") -> q62),
    "tpcds_q63_manager_monthly_dev" -> (Seq("lineitem") -> q63),
    "tpcds_q68_ticket_measures" -> (Seq("lineitem", "orders", "customer") -> q68),
    "tpcds_q73_ticket_count_band" -> (Seq("lineitem", "orders", "customer") -> q73),
    "tpcds_q74_yoy_quantity_pref" -> (Seq("lineitem", "orders", "customer") -> q74),
    "tpcds_q79_ticket_profit" -> (Seq("lineitem", "orders", "customer", "supplier") -> q79),
    "tpcds_q80_pnl_promo_anti" -> (Seq("lineitem", "supplier", "part") -> q80),
    "tpcds_q81_catalog_return_ratio" -> (Seq("lineitem", "orders", "customer", "nation") -> q81),
    "tpcds_q82_store_range_semi" -> (Seq("part", "lineitem") -> q82),
    "tpcds_q83_returns_date_union" -> (Seq("lineitem", "part") -> q83),
    "tpcds_q84_income_band_chain" -> (Seq("customer", "nation", "orders", "lineitem") -> q84),
    "tpcds_q86_web_lochierarchy" -> (Seq("lineitem", "part") -> q86),
    "tpcds_q91_callcenter_returns" -> (Seq("lineitem", "orders", "customer", "nation") -> q91),
    "tpcds_q96_time_band_count" -> (Seq("events") -> q96),
    "tpcds_q14b_cross_week_compare" -> (Seq("lineitem", "part") -> q14b),
    "tpcds_q23b_best_customer_split" -> (Seq("lineitem", "orders", "customer") -> q23b),
    "tpcds_q24b_netpaid_other_slice" -> (Seq("lineitem", "orders", "customer", "part") -> q24b),
    "tpcds_q39b_january_cov_strict" -> (Seq("lineitem") -> q39b))

  override def queries: Map[String, (SparkSession, String) => DataFrame] =
    texts.map { case (name, (tables, text)) =>
      name -> ((s: SparkSession, dir: String) => sql(s, dir, tables, spark(text)))
    }

  override def oracle: Map[String, String] =
    texts.map { case (name, (_, text)) => name -> duck(text) }
}
