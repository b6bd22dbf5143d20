package graft.queries

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * TPC-DS-shaped query-depth gates. The reference's hard correctness
 * bar is 103/103 TPC-DS variants at SF=1
 * (`flink-end-to-end-tests/flink-tpcds-test/.../TpcdsTestProgram.java:76-85`,
 * tolerance `utils/TpcdsResultComparator.java:53`); these gates mirror
 * the planner-stressing PATTERNS of that corpus — channel-UNION
 * rollups, WITH-chain double semi-joins, windows over aggregates,
 * grouping-sets ranking, EXISTS-disjunctions, multi-WITH cross
 * filters, scalar-scan cross products — on the driver's star schema
 * (lineitem `l_linestatus`/`l_returnflag` slices stand in for the
 * store/web/catalog channels; `part` for `item`).
 *
 * All queries run through `spark.sql` so the semi/anti/existence-join
 * rewrites, Expand placement, and window-group-limit pushdown come
 * from Catalyst exactly as the reference planner's rule set produces
 * its exec nodes. PlanAuditSpec pins the intended shapes (semi joins
 * on Q95/Q23, Expand + two-phase agg on the rollups, WindowGroupLimit
 * on Q67).
 *
 * Scale notes:
 *  - channel UNIONs scan the fact once per channel with pushed
 *    filters — no shuffle until the grouped aggregate;
 *  - the Q95 lineitem self-join is an equi-join on l_orderkey
 *    (bounded fan-out per order), then two LEFT SEMI probes of orders;
 *  - Q23's WITH frames are grouped-HAVING aggregates far smaller than
 *    the fact, so Catalyst broadcasts them into the semi joins;
 *  - money stays on the integer-cent grid per the repo convention, and
 *    the Q4 ratio compare is cross-multiplied in BIGINT (no float
 *    boundary).
 *
 * Shared template per query: `@TS '...'` expands to `TIMESTAMP_NTZ`
 * for Spark and `TIMESTAMP` for the DuckDB oracle — one text, two
 * dialects, no drift.
 */
object TpcdsShapeQueries extends QueryPack {

  private def sql(s: SparkSession, dir: String, tables: Seq[String], q: String): DataFrame = {
    tables.foreach(t => Tables.load(s, dir, t).createOrReplaceTempView(t))
    s.sql(q)
  }

  private def spark(t: String): String =
    // @MAT marks a DuckDB-side CTE materialization hint (AS MATERIALIZED
    // forces a mis-planned oracle join order or stops exponential CTE
    // re-inlining); Spark has no such clause and plans the plain CTE fine
    t.replace("@TS", "TIMESTAMP_NTZ").replace("@IDIV", "div")
      .replaceAll("@MAT\\b\\s*", "")
  private def duck(t: String): String =
    t.replace("@TS", "TIMESTAMP").replace("@IDIV", "//")
      .replace("@MAT", "MATERIALIZED")

  // Q5/Q71 family: per-channel SELECTs with channel-specific filters
  // and a returns leg, UNION ALL'd, then ROLLUP over (channel, flag)
  // with GROUPING() marking subtotal levels.
  private val q5 = """
      WITH channels AS (
        SELECT 'store' AS channel, l_returnflag AS flag,
               CAST(floor(l_extendedprice * 100) AS BIGINT) AS sales_cents,
               CASE WHEN l_returnflag = 'R' THEN CAST(floor(l_extendedprice * 100) AS BIGINT) ELSE 0 END AS returns_cents
        FROM lineitem WHERE l_linestatus = 'F'
        UNION ALL
        SELECT 'web', l_returnflag,
               CAST(floor(l_extendedprice * 100) AS BIGINT),
               CASE WHEN l_returnflag = 'R' THEN CAST(floor(l_extendedprice * 100) AS BIGINT) ELSE 0 END
        FROM lineitem WHERE l_linestatus = 'O' AND l_shipdate < @TS'1999-01-01 00:00:00'
        UNION ALL
        SELECT 'catalog', l_returnflag,
               CAST(floor(l_extendedprice * 100) AS BIGINT),
               CASE WHEN l_returnflag = 'R' THEN CAST(floor(l_extendedprice * 100) AS BIGINT) ELSE 0 END
        FROM lineitem WHERE l_linestatus = 'O' AND l_shipdate >= @TS'1999-01-01 00:00:00')
      SELECT channel, flag,
             CAST(grouping(channel) + grouping(flag) AS INT) AS lvl,
             CAST(sum(sales_cents) AS BIGINT) AS sales_cents,
             CAST(sum(returns_cents) AS BIGINT) AS returns_cents
      FROM channels
      GROUP BY ROLLUP(channel, flag)
      ORDER BY channel NULLS FIRST, flag NULLS FIRST"""

  // Q95: WITH-chain — a DISTINCT self-join frame (orders shipped by
  // more than one supplier, the ws_wh analog) consumed twice as IN
  // (LEFT SEMI) probes of the filtered orders scan.
  private val q95 = """
      WITH multi_supp AS (
        SELECT DISTINCT ws1.l_orderkey AS okey
        FROM lineitem ws1, lineitem ws2
        WHERE ws1.l_orderkey = ws2.l_orderkey AND ws1.l_suppkey <> ws2.l_suppkey),
      returned AS (
        SELECT DISTINCT l_orderkey AS okey FROM lineitem WHERE l_returnflag = 'R')
      SELECT count(DISTINCT o_orderkey) AS order_count,
             CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
      FROM orders
      WHERE o_orderdate >= @TS'1997-01-01 00:00:00'
        AND o_orderdate < @TS'1997-07-01 00:00:00'
        AND o_orderstatus = 'F'
        AND o_orderkey IN (SELECT okey FROM multi_supp)
        AND o_orderkey IN (SELECT okey FROM returned)"""

  // Q51: window over aggregate — per-channel monthly aggregates FULL
  // OUTER joined, cumulative sums per supplier, cross-channel compare.
  private val q51 = """
      WITH store_m AS (
        SELECT l_suppkey AS sk, CAST(year(l_shipdate) * 100 + month(l_shipdate) AS INT) AS ym,
               sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS sales
        FROM lineitem WHERE l_linestatus = 'F' GROUP BY 1, 2),
      web_m AS (
        SELECT l_suppkey AS sk, CAST(year(l_shipdate) * 100 + month(l_shipdate) AS INT) AS ym,
               sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS sales
        FROM lineitem WHERE l_linestatus = 'O' GROUP BY 1, 2)
      SELECT sk, ym, store_cum, web_cum
      FROM (
        SELECT COALESCE(s.sk, w.sk) AS sk, COALESCE(s.ym, w.ym) AS ym,
               CAST(sum(s.sales) OVER (PARTITION BY COALESCE(s.sk, w.sk) ORDER BY COALESCE(s.ym, w.ym)
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS store_cum,
               CAST(sum(w.sales) OVER (PARTITION BY COALESCE(s.sk, w.sk) ORDER BY COALESCE(s.ym, w.ym)
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS web_cum
        FROM store_m s FULL OUTER JOIN web_m w ON s.sk = w.sk AND s.ym = w.ym) t
      WHERE web_cum > store_cum
      ORDER BY sk, ym"""

  // Q67: 3-dim ROLLUP then top-k per brand partition via rank() —
  // Catalyst plans the rank filter as WindowGroupLimit above Expand.
  private val q67 = """
      SELECT p_brand, p_type, p_size, sumsales, CAST(rk AS INT) AS rk
      FROM (
        SELECT p_brand, p_type, p_size,
               CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sumsales,
               rank() OVER (PARTITION BY p_brand
                            ORDER BY sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) DESC,
                                     p_type NULLS FIRST, p_size NULLS FIRST) AS rk
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= @TS'1997-01-01 00:00:00'
          AND l_shipdate < @TS'1998-01-01 00:00:00'
        GROUP BY ROLLUP(p_brand, p_type, p_size)) t
      WHERE rk <= 5
      ORDER BY p_brand NULLS FIRST, rk, p_type NULLS FIRST, p_size NULLS FIRST"""

  // Q10: EXISTS-chain — a required channel EXISTS AND a DISJUNCTION of
  // two more (ExistenceJoin output, not plain semi, for the OR arms).
  private val q10 = """
      SELECT c_mktsegment, count(*) AS cnt
      FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= @TS'1997-01-01 00:00:00'
                      AND o.o_orderdate < @TS'1998-01-01 00:00:00')
        AND (EXISTS (SELECT 1 FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
                     WHERE o.o_custkey = c.c_custkey AND l.l_linestatus = 'F'
                       AND l.l_shipdate >= @TS'1997-06-01 00:00:00'
                       AND l.l_shipdate < @TS'1997-09-01 00:00:00')
          OR EXISTS (SELECT 1 FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
                     WHERE o.o_custkey = c.c_custkey AND l.l_linestatus = 'O'
                       AND l.l_shipdate >= @TS'1997-06-01 00:00:00'
                       AND l.l_shipdate < @TS'1997-09-01 00:00:00'))
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment"""

  // Q23: multi-WITH cross filter — two independent grouped-HAVING
  // frames (frequent items, best customers) both semi-join the fact.
  private val q23 = """
      WITH frequent_parts AS (
        SELECT l_partkey AS pk FROM lineitem GROUP BY l_partkey HAVING count(*) > 40),
      best_customers AS (
        SELECT o_custkey AS ck FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY o_custkey HAVING sum(l_quantity) > 1200)
      SELECT CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sales_cents,
             count(*) AS n
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderdate >= @TS'1998-01-01 00:00:00'
        AND o_orderdate < @TS'1998-07-01 00:00:00'
        AND l_partkey IN (SELECT pk FROM frequent_parts)
        AND o_custkey IN (SELECT ck FROM best_customers)"""

  // Q71: channel UNION joined to the item dim, grouped by brand and
  // time bucket, revenue-ordered.
  private val q71 = """
      WITH sales AS (
        SELECT l_partkey AS pk, CAST(month(l_shipdate) AS INT) AS m,
               CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents
        FROM lineitem WHERE l_linestatus = 'F'
          AND l_shipdate >= @TS'1997-01-01 00:00:00' AND l_shipdate < @TS'1998-01-01 00:00:00'
        UNION ALL
        SELECT l_partkey, CAST(month(l_shipdate) AS INT),
               CAST(floor(l_extendedprice * 100) AS BIGINT)
        FROM lineitem WHERE l_linestatus = 'O'
          AND l_shipdate >= @TS'1997-01-01 00:00:00' AND l_shipdate < @TS'1998-01-01 00:00:00'
        UNION ALL
        SELECT l_partkey, CAST(month(l_shipdate) AS INT),
               CAST(floor(l_extendedprice * 100) AS BIGINT)
        FROM lineitem WHERE l_returnflag = 'R'
          AND l_shipdate >= @TS'1997-01-01 00:00:00' AND l_shipdate < @TS'1998-01-01 00:00:00')
      SELECT p_brand, m, CAST(sum(cents) AS BIGINT) AS ext_cents
      FROM sales JOIN part ON pk = p_partkey
      WHERE p_type IN ('ECONOMY', 'STANDARD')
      GROUP BY p_brand, m
      ORDER BY ext_cents DESC, p_brand, m"""

  // Q4/Q11: year-over-year growth — one WITH frame self-joined four
  // ways; the ratio compare is cross-multiplied in BIGINT so both
  // engines decide the inequality exactly.
  private val q4 = """
      WITH year_total AS (
        SELECT o_custkey AS ck, CAST(year(o_orderdate) AS INT) AS yr, l_linestatus AS channel,
               CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS total
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY 1, 2, 3)
      SELECT ss2.ck AS c_custkey, ss2.total AS store_97, ws2.total AS web_97
      FROM year_total ss1, year_total ss2, year_total ws1, year_total ws2
      WHERE ss1.ck = ss2.ck AND ss1.ck = ws1.ck AND ss1.ck = ws2.ck
        AND ss1.channel = 'F' AND ss1.yr = 1996
        AND ss2.channel = 'F' AND ss2.yr = 1997
        AND ws1.channel = 'O' AND ws1.yr = 1996
        AND ws2.channel = 'O' AND ws2.yr = 1997
        AND ss1.total > 0 AND ws1.total > 0
        AND ws2.total * ss1.total > ss2.total * ws1.total
      ORDER BY c_custkey"""

  // Q88: cross product of independent single-row count scans — the
  // planner must broadcast each 1-row aggregate (BNLJ, no shuffle).
  private val q88 = """
      SELECT h1, h2, h3, h4
      FROM (SELECT count(*) AS h1 FROM lineitem WHERE l_quantity BETWEEN 1 AND 10 AND l_discount < 0.03) s1,
           (SELECT count(*) AS h2 FROM lineitem WHERE l_quantity BETWEEN 11 AND 20 AND l_discount < 0.03) s2,
           (SELECT count(*) AS h3 FROM lineitem WHERE l_quantity BETWEEN 21 AND 30 AND l_discount < 0.03) s3,
           (SELECT count(*) AS h4 FROM lineitem WHERE l_quantity BETWEEN 31 AND 50 AND l_discount < 0.03) s4"""

  // Q36: grouping-level hierarchy rank — GROUPING() marks compose the
  // lochierarchy, and rank partitions collapse to brand only on detail
  // rows (the CASE WHEN gt = 0 trick from the published query).
  private val q36 = """
      SELECT CAST(lochierarchy AS INT) AS lochierarchy, p_brand, p_type, gross_cents, CAST(rk AS INT) AS rk
      FROM (
        SELECT p_brand, p_type, lochierarchy, gross_cents,
               rank() OVER (PARTITION BY lochierarchy, CASE WHEN gt = 0 THEN p_brand END
                            ORDER BY gross_cents DESC, p_type NULLS FIRST, p_brand NULLS FIRST) AS rk
        FROM (
          SELECT p_brand, p_type,
                 CAST(grouping(p_brand) + grouping(p_type) AS INT) AS lochierarchy,
                 CAST(grouping(p_type) AS INT) AS gt,
                 CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS gross_cents
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE l_shipdate >= @TS'1997-01-01 00:00:00'
            AND l_shipdate < @TS'1998-01-01 00:00:00'
          GROUP BY ROLLUP(p_brand, p_type)) g) t
      ORDER BY lochierarchy DESC, p_brand NULLS FIRST, rk"""

  // Q33/Q56: aggregate OVER a union of per-channel AGGREGATES (not a
  // union of raw scans) — partials are grouped per channel first.
  private val q33 = """
      WITH ss AS (
        SELECT p_brand, sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS total
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_linestatus = 'F' AND p_type = 'ECONOMY' GROUP BY p_brand),
      cs AS (
        SELECT p_brand, sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS total
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_linestatus = 'O' AND p_type = 'ECONOMY' GROUP BY p_brand),
      ws AS (
        SELECT p_brand, sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS total
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_returnflag = 'R' AND p_type = 'ECONOMY' GROUP BY p_brand)
      SELECT p_brand, CAST(sum(total) AS BIGINT) AS total_cents
      FROM (SELECT * FROM ss UNION ALL SELECT * FROM cs UNION ALL SELECT * FROM ws) u
      GROUP BY p_brand
      ORDER BY total_cents, p_brand"""

  // Q14: cross-channel INTERSECT — the item set present in ALL three
  // channels (INTERSECT chain inside a WITH frame) restricts the
  // grouped sales aggregate. Catalyst plans INTERSECT as left-semi
  // joins over DISTINCT scans; the IN probe is one more semi join.
  private val q14 = """
      WITH cross_items AS (
        SELECT l_partkey AS pk FROM lineitem WHERE l_linestatus = 'F'
        INTERSECT
        SELECT l_partkey FROM lineitem WHERE l_linestatus = 'O' AND l_returnflag <> 'R'
        INTERSECT
        SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R')
      SELECT p_brand, CAST(count(*) AS BIGINT) AS n_sales,
             CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sales_cents
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_partkey IN (SELECT pk FROM cross_items)
        AND l_shipdate >= @TS'1998-01-01 00:00:00' AND l_shipdate < @TS'1999-01-01 00:00:00'
      GROUP BY p_brand ORDER BY p_brand"""

  // Q39: per-period stats with a coefficient-of-variation filter,
  // self-joined on CONSECUTIVE periods (both periods must be
  // high-variance). The CoV^2 >= 1/3 test is integer cross-multiplied
  // from the raw (n, sum q, sum q^2) moments — n(n*Sq2 - Sq^2) is
  // n(n-1)var — so the flag is bit-identical across engines with no
  // stddev float boundary.
  private val q39 = """
      WITH stats AS (
        SELECT l_suppkey AS sk, CAST(month(l_shipdate) AS INT) AS mn,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq,
               CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq2
        FROM lineitem
        WHERE l_shipdate >= @TS'1997-01-01 00:00:00' AND l_shipdate < @TS'1998-01-01 00:00:00'
        GROUP BY l_suppkey, month(l_shipdate)),
      flagged AS (
        SELECT * FROM stats
        WHERE n > 1 AND 3 * n * (n * sq2 - sq * sq) >= (n - 1) * sq * sq)
      SELECT f1.sk AS suppkey, f1.mn AS mn1, f1.n AS n1, f1.sq AS q1,
             f2.n AS n2, f2.sq AS q2
      FROM flagged f1 JOIN flagged f2 ON f1.sk = f2.sk AND f2.mn = f1.mn + 1
      ORDER BY suppkey, mn1"""

  // Q78: sales WITHOUT a matching return (null-filtered LEFT JOIN =
  // anti join) per channel, channels joined on item with an integer
  // cross-multiplied ratio filter — the returns-exclusion + channel
  // -ratio pattern.
  private val q78 = """
      WITH returned AS (
        SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem WHERE l_returnflag = 'R'),
      ss AS (
        SELECT s.l_partkey AS pk,
               CAST(sum(CAST(s.l_quantity AS BIGINT)) AS BIGINT) AS qty,
               CAST(sum(CAST(floor(s.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM lineitem s LEFT JOIN returned r ON s.l_orderkey = r.ok AND s.l_partkey = r.pk
        WHERE r.ok IS NULL AND s.l_linestatus = 'F'
        GROUP BY s.l_partkey),
      ws AS (
        SELECT s.l_partkey AS pk,
               CAST(sum(CAST(s.l_quantity AS BIGINT)) AS BIGINT) AS qty,
               CAST(sum(CAST(floor(s.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM lineitem s LEFT JOIN returned r ON s.l_orderkey = r.ok AND s.l_partkey = r.pk
        WHERE r.ok IS NULL AND s.l_linestatus = 'O'
        GROUP BY s.l_partkey)
      SELECT ss.pk AS partkey, ss.qty AS store_qty, ws.qty AS other_qty,
             ss.cents AS store_cents, ws.cents AS other_cents
      FROM ss JOIN ws ON ss.pk = ws.pk
      WHERE 2 * ws.qty <= 3 * ss.qty
      ORDER BY partkey"""

  // Q47/Q57: several window functions over ONE monthly aggregate —
  // per-partition sum/count (the year average, kept as raw integer
  // moments), lag and lead of the monthly sales — then a deviation
  // filter. The avg compare is cross-multiplied in BIGINT (sales >
  // 1.1 * avg  ⇔  10 * n * sales > 11 * yr_sum), so no float boundary.
  // Catalyst must evaluate all four window functions in one Window
  // over the aggregate's output (single sort per supplier).
  private val q47 = """
      WITH monthly AS (
        SELECT l_suppkey AS sk, CAST(month(l_shipdate) AS INT) AS mn,
               CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sales
        FROM lineitem
        WHERE l_shipdate >= @TS'1997-01-01 00:00:00'
          AND l_shipdate < @TS'1998-01-01 00:00:00'
        GROUP BY l_suppkey, month(l_shipdate)),
      v AS (
        SELECT sk, mn, sales,
               CAST(sum(sales) OVER (PARTITION BY sk) AS BIGINT) AS yr_sum,
               CAST(count(*) OVER (PARTITION BY sk) AS BIGINT) AS yr_n,
               lag(sales) OVER (PARTITION BY sk ORDER BY mn) AS prev_sales,
               lead(sales) OVER (PARTITION BY sk ORDER BY mn) AS next_sales
        FROM monthly)
      SELECT sk AS suppkey, mn, sales, prev_sales, next_sales
      FROM v
      WHERE prev_sales IS NOT NULL AND next_sales IS NOT NULL
        AND 10 * yr_n * sales > 11 * yr_sum
      ORDER BY suppkey, mn"""

  // Q1: correlated scalar aggregates over a grouped WITH frame — each
  // customer's returns total compared against 1.2× the average of its
  // OWN nation's group (avg decorrelated into count/sum scalar
  // subqueries, integer cross-multiplied: 5·ret·n > 6·Σret). Catalyst
  // must decorrelate both subqueries into aggregate+join.
  private val q1 = """
      WITH ctr AS (
        SELECT o_custkey AS ck, c_nationkey AS nk,
               CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS ret
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
                    JOIN customer ON o_custkey = c_custkey
        WHERE l_returnflag = 'R'
        GROUP BY o_custkey, c_nationkey)
      SELECT c1.ck AS custkey, c1.nk AS nationkey, c1.ret AS ret_cents
      FROM ctr c1
      WHERE 5 * c1.ret * (SELECT count(*) FROM ctr c2 WHERE c2.nk = c1.nk)
            > 6 * (SELECT sum(c2.ret) FROM ctr c2 WHERE c2.nk = c1.nk)
      ORDER BY custkey"""

  // Q17/Q25/Q29: a three-fact chain — sale → return → repurchase in
  // date order, two equi-joins with a date inequality, never a
  // cartesian. The published queries chain on (customer, item); this
  // synthetic data has no ticket identity linking a sale to its
  // return, so the chain key is relaxed to the customer (Q25's
  // customer-journey semantics). Fan-out is bounded per customer —
  // per-customer activity is constant in SF, so the chain stays
  // linear at scale; the first leg's quarter filter prunes the probe
  // side before either join.
  private val q17 = """
      WITH s AS (
        SELECT o_custkey AS ck, CAST(l_quantity AS BIGINT) AS q, o_orderdate AS d
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_linestatus = 'F' AND l_returnflag <> 'R'
          AND o_orderdate >= @TS'1997-01-01 00:00:00' AND o_orderdate < @TS'1997-04-01 00:00:00'),
      r AS (
        SELECT o_custkey AS ck, CAST(l_quantity AS BIGINT) AS q, o_orderdate AS d
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= @TS'1997-01-01 00:00:00' AND o_orderdate < @TS'1997-10-01 00:00:00'),
      c AS (
        SELECT o_custkey AS ck, CAST(l_quantity AS BIGINT) AS q, o_orderdate AS d
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_linestatus = 'O'
          AND o_orderdate >= @TS'1997-01-01 00:00:00' AND o_orderdate < @TS'1998-01-01 00:00:00')
      SELECT s.ck AS custkey, CAST(count(*) AS BIGINT) AS n_chains,
             CAST(sum(s.q) AS BIGINT) AS sold_qty,
             CAST(sum(r.q) AS BIGINT) AS ret_qty,
             CAST(sum(c.q) AS BIGINT) AS rebuy_qty
      FROM s JOIN r ON s.ck = r.ck AND r.d >= s.d
             JOIN c ON r.ck = c.ck AND c.d >= r.d
      GROUP BY s.ck
      ORDER BY custkey"""

  // Q49: per-channel return ratios ranked under TWO different
  // orderings over the same frame (return rate and currency ratio),
  // kept when EITHER rank ≤ 10, channels UNION ALL'd. Rank orderings
  // divide BIGINTs as doubles — exact for these magnitudes (< 2^53),
  // so both engines sort identical doubles; pk breaks all ties.
  private val q49 = """
      WITH by_part AS (
        SELECT l_linestatus AS ch, l_partkey AS pk,
               CAST(sum(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS ret_qty,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
               CAST(sum(CASE WHEN l_returnflag = 'R' THEN CAST(floor(l_extendedprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS ret_cents,
               CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM lineitem
        WHERE l_shipdate >= @TS'1997-01-01 00:00:00'
          AND l_shipdate < @TS'1997-07-01 00:00:00'
        GROUP BY l_linestatus, l_partkey),
      ranked AS (
        SELECT ch, pk, ret_qty, qty,
               rank() OVER (PARTITION BY ch
                            ORDER BY CAST(ret_qty AS DOUBLE) / qty DESC, pk) AS rnk_qty,
               rank() OVER (PARTITION BY ch
                            ORDER BY CAST(ret_cents AS DOUBLE) / cents DESC, pk) AS rnk_amt
        FROM by_part
        WHERE qty > 0 AND cents > 0)
      SELECT ch AS channel, pk AS partkey, ret_qty, qty,
             CAST(rnk_qty AS INT) AS rnk_qty, CAST(rnk_amt AS INT) AS rnk_amt
      FROM ranked
      WHERE rnk_qty <= 10 OR rnk_amt <= 10
      ORDER BY channel, rnk_qty, rnk_amt, partkey"""

  // Q97: channel-overlap counts — two DISTINCT (customer, item)
  // frames FULL OUTER joined on the composite key, null-sides counted
  // into exclusive/both buckets. The planner must keep the composite
  // equi-key (a full outer join can never broadcast), and the DISTINCT
  // frames shuffle once each on the same key the join reuses.
  private val q97 = """
      WITH ssci AS (
        SELECT DISTINCT o_custkey AS ck, l_partkey AS pk
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_linestatus = 'F'),
      csci AS (
        SELECT DISTINCT o_custkey AS ck, l_partkey AS pk
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_linestatus = 'O')
      SELECT CAST(sum(CASE WHEN s.ck IS NOT NULL AND c.ck IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS store_only,
             CAST(sum(CASE WHEN s.ck IS NULL AND c.ck IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS catalog_only,
             CAST(sum(CASE WHEN s.ck IS NOT NULL AND c.ck IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS both_channels
      FROM ssci s FULL OUTER JOIN csci c ON s.ck = c.ck AND s.pk = c.pk"""

  // Q31: ratio-of-growth chain — six quarterly aggregate frames (three
  // per channel) equi-joined on the nation key, keeping nations where
  // the web channel grew faster than the store channel in BOTH
  // consecutive quarter pairs. The growth compare cross-multiplies as
  // DOUBLE: each BIGINT cent sum is < 2^53 so the conversion is exact
  // and the IEEE product compare is engine-identical (the q49
  // precedent), while a BIGINT product could overflow at large SF.
  private val q31 = """
      WITH ss AS (
        SELECT c_nationkey AS nk, CAST(quarter(o_orderdate) AS INT) AS q,
               CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sales
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             JOIN customer ON o_custkey = c_custkey
        WHERE year(o_orderdate) = 1997 AND l_linestatus = 'F'
        GROUP BY c_nationkey, quarter(o_orderdate)),
      ws AS (
        SELECT c_nationkey AS nk, CAST(quarter(o_orderdate) AS INT) AS q,
               CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sales
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             JOIN customer ON o_custkey = c_custkey
        WHERE year(o_orderdate) = 1997 AND l_linestatus = 'O'
        GROUP BY c_nationkey, quarter(o_orderdate))
      SELECT ss1.nk AS nationkey,
             ss1.sales AS ss_q1, ss2.sales AS ss_q2, ss3.sales AS ss_q3,
             ws1.sales AS ws_q1, ws2.sales AS ws_q2, ws3.sales AS ws_q3
      FROM ss ss1 JOIN ss ss2 ON ss1.nk = ss2.nk AND ss1.q = 1 AND ss2.q = 2
           JOIN ss ss3 ON ss1.nk = ss3.nk AND ss3.q = 3
           JOIN ws ws1 ON ss1.nk = ws1.nk AND ws1.q = 1
           JOIN ws ws2 ON ss1.nk = ws2.nk AND ws2.q = 2
           JOIN ws ws3 ON ss1.nk = ws3.nk AND ws3.q = 3
      WHERE ss1.sales > 0 AND ss2.sales > 0 AND ws1.sales > 0 AND ws2.sales > 0
        AND CAST(ws2.sales AS DOUBLE) * CAST(ss1.sales AS DOUBLE) >
            CAST(ss2.sales AS DOUBLE) * CAST(ws1.sales AS DOUBLE)
        AND CAST(ws3.sales AS DOUBLE) * CAST(ss2.sales AS DOUBLE) >
            CAST(ss3.sales AS DOUBLE) * CAST(ws2.sales AS DOUBLE)
      ORDER BY nationkey"""

  // Q34/Q73: count-bucket HAVING frame joined back to the dimension —
  // per-order item counts in a date window, kept when the count lands
  // in a band, then a selective join back to customer. The HAVING
  // frame is far smaller than the fact, so Catalyst broadcasts the
  // customer dim into the final join (or the frame into customer);
  // either way no full-fact second shuffle.
  private val q34 = """
      WITH per_order AS (
        SELECT o_orderkey, o_custkey, count(*) AS cnt
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderdate >= @TS'1997-01-01 00:00:00'
          AND o_orderdate < @TS'1998-01-01 00:00:00'
        GROUP BY o_orderkey, o_custkey
        HAVING count(*) BETWEEN 5 AND 7)
      SELECT c_custkey AS custkey, c_name, o_orderkey AS orderkey,
             CAST(cnt AS BIGINT) AS cnt
      FROM per_order JOIN customer ON o_custkey = c_custkey
      ORDER BY custkey, orderkey"""

  // Q70: ranking WITHIN grouping level — a two-dim ROLLUP whose window
  // partitions by the GROUPING() level (and the brand only at the
  // detail level), top-5 per partition. Catalyst places the rank
  // filter as WindowGroupLimit above the Expand-based rollup.
  private val q70 = """
      WITH rolled AS (
        SELECT p_brand AS brand, p_type AS container,
               CAST(grouping(p_brand) + grouping(p_type) AS INT) AS lvl,
               CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= @TS'1997-01-01 00:00:00'
          AND l_shipdate < @TS'1997-07-01 00:00:00'
        GROUP BY ROLLUP(p_brand, p_type)),
      ranked AS (
        SELECT brand, container, lvl, cents,
               rank() OVER (PARTITION BY lvl, CASE WHEN lvl = 0 THEN brand END
                            ORDER BY cents DESC, brand, container) AS rnk
        FROM rolled)
      SELECT brand, container, lvl, cents, CAST(rnk AS INT) AS rnk
      FROM ranked
      WHERE rnk <= 5
      ORDER BY lvl DESC, brand NULLS FIRST, rnk, container NULLS FIRST"""

  // Q64: one WITH frame consumed TWICE as a cross-period self-join on
  // the item key (cs1 year-1996 vs cs2 year-1997, count-dominance
  // residual). Stresses CTE reuse under self-join: both sides shuffle
  // on pk once each; the join itself is a plain equi-join with the
  // cnt inequality as residual — never all-pairs.
  private val q64 = """
      WITH cross_sales AS (
        SELECT l_partkey AS pk, CAST(year(o_orderdate) AS INT) AS yr,
               CAST(count(*) AS BIGINT) AS cnt,
               CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderdate >= @TS'1996-01-01 00:00:00'
          AND o_orderdate < @TS'1998-01-01 00:00:00'
        GROUP BY l_partkey, year(o_orderdate))
      SELECT cs1.pk AS partkey, cs1.cnt AS cnt1, cs2.cnt AS cnt2,
             cs1.cents AS cents1, cs2.cents AS cents2
      FROM cross_sales cs1 JOIN cross_sales cs2
        ON cs1.pk = cs2.pk AND cs1.yr = 1996 AND cs2.yr = 1997
           AND cs2.cnt <= cs1.cnt
      ORDER BY partkey"""

  // Q58: three per-channel aggregate frames equi-joined on the item,
  // kept when EVERY channel's sales sit within 10% of the three-way
  // average — the band compare cross-multiplies on the BIGINT cent
  // grid (30·x vs 9·sum and 33·sum bounds), no float boundary at all.
  private val q58 = """
      WITH ss AS (
        SELECT l_partkey AS pk,
               CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM lineitem WHERE l_linestatus = 'F' AND l_returnflag <> 'R'
        GROUP BY l_partkey),
      cs AS (
        SELECT l_partkey AS pk,
               CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM lineitem WHERE l_linestatus = 'O' AND l_shipdate < @TS'1998-01-01 00:00:00'
        GROUP BY l_partkey),
      ws AS (
        SELECT l_partkey AS pk,
               CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM lineitem WHERE l_linestatus = 'O' AND l_shipdate >= @TS'1998-01-01 00:00:00'
        GROUP BY l_partkey)
      SELECT ss.pk AS partkey, ss.cents AS store_cents,
             cs.cents AS catalog_cents, ws.cents AS web_cents
      FROM ss JOIN cs ON ss.pk = cs.pk JOIN ws ON ss.pk = ws.pk
      WHERE 30 * ss.cents >= 9 * (ss.cents + cs.cents + ws.cents)
        AND 30 * ss.cents <= 11 * (ss.cents + cs.cents + ws.cents)
        AND 30 * cs.cents >= 9 * (ss.cents + cs.cents + ws.cents)
        AND 30 * cs.cents <= 11 * (ss.cents + cs.cents + ws.cents)
        AND 30 * ws.cents >= 9 * (ss.cents + cs.cents + ws.cents)
        AND 30 * ws.cents <= 11 * (ss.cents + cs.cents + ws.cents)
      ORDER BY partkey"""

  // Q59: week-shifted self-comparison — weekly supplier sales for two
  // adjacent half-years joined on (supplier, week-of-half), comparing
  // the same week across halves. The join key is a computed modular
  // week index; both sides come from one grouped frame.
  private val q59 = """
      WITH weekly AS (
        SELECT l_suppkey AS sk,
               CAST(floor((dayofyear(l_shipdate) - 1) / 7) AS INT) AS wk,
               CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM lineitem
        WHERE l_shipdate >= @TS'1997-01-01 00:00:00'
          AND l_shipdate < @TS'1998-01-01 00:00:00'
        GROUP BY 1, 2)
      SELECT h1.sk AS suppkey, h1.wk AS wk1, h2.wk AS wk2,
             h1.cents AS cents_h1, h2.cents AS cents_h2
      FROM weekly h1 JOIN weekly h2
        ON h1.sk = h2.sk AND h2.wk = h1.wk + 26
      WHERE h1.wk < 26
      ORDER BY suppkey, wk1"""

  // Q2: day-of-week CASE-pivot into seven wide columns per (year,
  // week), then a year-shifted self-join comparing the same week —
  // the wide-pivot + aligned self-join shape. The pivot key is
  // (dayofyear-1) % 7, NOT dayofweek(): Spark's dayofweek is 1-based
  // Sunday, DuckDB's 0-based — the modular day index is
  // engine-identical and keeps the shape intact.
  private val q2 = """
      WITH wk AS (
        SELECT CAST(year(l_shipdate) AS INT) AS yr,
               CAST(floor((dayofyear(l_shipdate) - 1) / 7) AS INT) AS wk,
               CAST(sum(CASE WHEN (dayofyear(l_shipdate) - 1) % 7 = 0 THEN CAST(floor(l_extendedprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS d0_cents,
               CAST(sum(CASE WHEN (dayofyear(l_shipdate) - 1) % 7 = 1 THEN CAST(floor(l_extendedprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS d1_cents,
               CAST(sum(CASE WHEN (dayofyear(l_shipdate) - 1) % 7 = 2 THEN CAST(floor(l_extendedprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS d2_cents,
               CAST(sum(CASE WHEN (dayofyear(l_shipdate) - 1) % 7 = 3 THEN CAST(floor(l_extendedprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS d3_cents,
               CAST(sum(CASE WHEN (dayofyear(l_shipdate) - 1) % 7 = 4 THEN CAST(floor(l_extendedprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS d4_cents,
               CAST(sum(CASE WHEN (dayofyear(l_shipdate) - 1) % 7 = 5 THEN CAST(floor(l_extendedprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS d5_cents,
               CAST(sum(CASE WHEN (dayofyear(l_shipdate) - 1) % 7 = 6 THEN CAST(floor(l_extendedprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS d6_cents
        FROM lineitem
        WHERE l_shipdate >= @TS'1996-01-01 00:00:00'
          AND l_shipdate < @TS'1998-01-01 00:00:00'
        GROUP BY 1, 2)
      SELECT y1.wk AS wk,
             y1.d0_cents AS d0_y1, y2.d0_cents AS d0_y2,
             y1.d3_cents AS d3_y1, y2.d3_cents AS d3_y2,
             y1.d6_cents AS d6_y1, y2.d6_cents AS d6_y2
      FROM wk y1 JOIN wk y2 ON y1.wk = y2.wk AND y1.yr = 1996 AND y2.yr = 1997
      ORDER BY wk"""

  // Q35: customers gated by a required EXISTS and an OR of two channel
  // INs, then multi-statistic aggregates (count/sum/min/max) grouped
  // by (segment, nation) after joining a per-customer stats frame —
  // Q10's gate with Q35's grouped-stats consumption on top.
  private val q35 = """
      WITH gated AS (
        SELECT c_custkey, c_mktsegment, c_nationkey
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= @TS'1997-01-01 00:00:00'
                        AND o.o_orderdate < @TS'1998-01-01 00:00:00')
          AND (c_custkey IN (SELECT o_custkey FROM orders
                             JOIN lineitem ON l_orderkey = o_orderkey
                             WHERE l_linestatus = 'F')
               OR c_custkey IN (SELECT o_custkey FROM orders
                                JOIN lineitem ON l_orderkey = o_orderkey
                                WHERE l_returnflag = 'R'))),
      stats AS (
        SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM orders GROUP BY o_custkey)
      SELECT g.c_mktsegment AS seg, g.c_nationkey AS nk,
             CAST(count(*) AS BIGINT) AS n_cust,
             CAST(sum(s.n_orders) AS BIGINT) AS n_orders,
             CAST(min(s.cents) AS BIGINT) AS min_cents,
             CAST(max(s.cents) AS BIGINT) AS max_cents,
             CAST(sum(s.cents) AS BIGINT) AS sum_cents
      FROM gated g JOIN stats s ON g.c_custkey = s.o_custkey
      GROUP BY 1, 2
      ORDER BY seg, nk"""

  // Q66: wide channel×month CASE-pivot — a two-channel UNION scanned
  // once, then twelve conditional sums fan each (supplier, year) row
  // out into per-channel per-month columns plus a cross-channel total.
  // The planner sees one Expand-free hash aggregate with 13 aggregate
  // expressions over a union scan: the "wide pivot over a channel
  // union" shape (TPC-DS web_sales/catalog_sales by warehouse+month).
  private val q66 = """
      WITH chan AS (
        SELECT 'store' AS channel, l_suppkey AS sk,
               CAST(year(l_shipdate) AS INT) AS yr,
               CAST(month(l_shipdate) AS INT) AS m,
               CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents
        FROM lineitem WHERE l_linestatus = 'F'
        UNION ALL
        SELECT 'web', l_suppkey, CAST(year(l_shipdate) AS INT),
               CAST(month(l_shipdate) AS INT),
               CAST(floor(l_extendedprice * 100) AS BIGINT)
        FROM lineitem WHERE l_linestatus = 'O')
      SELECT sk, yr,
             CAST(sum(CASE WHEN channel = 'store' AND m <= 2 THEN cents ELSE 0 END) AS BIGINT) AS st_q1a,
             CAST(sum(CASE WHEN channel = 'store' AND m BETWEEN 3 AND 4 THEN cents ELSE 0 END) AS BIGINT) AS st_q1b,
             CAST(sum(CASE WHEN channel = 'store' AND m BETWEEN 5 AND 6 THEN cents ELSE 0 END) AS BIGINT) AS st_q2a,
             CAST(sum(CASE WHEN channel = 'store' AND m BETWEEN 7 AND 8 THEN cents ELSE 0 END) AS BIGINT) AS st_q3a,
             CAST(sum(CASE WHEN channel = 'store' AND m BETWEEN 9 AND 10 THEN cents ELSE 0 END) AS BIGINT) AS st_q4a,
             CAST(sum(CASE WHEN channel = 'store' AND m >= 11 THEN cents ELSE 0 END) AS BIGINT) AS st_q4b,
             CAST(sum(CASE WHEN channel = 'web' AND m <= 2 THEN cents ELSE 0 END) AS BIGINT) AS wb_q1a,
             CAST(sum(CASE WHEN channel = 'web' AND m BETWEEN 3 AND 4 THEN cents ELSE 0 END) AS BIGINT) AS wb_q1b,
             CAST(sum(CASE WHEN channel = 'web' AND m BETWEEN 5 AND 6 THEN cents ELSE 0 END) AS BIGINT) AS wb_q2a,
             CAST(sum(CASE WHEN channel = 'web' AND m BETWEEN 7 AND 8 THEN cents ELSE 0 END) AS BIGINT) AS wb_q3a,
             CAST(sum(CASE WHEN channel = 'web' AND m BETWEEN 9 AND 10 THEN cents ELSE 0 END) AS BIGINT) AS wb_q4a,
             CAST(sum(CASE WHEN channel = 'web' AND m >= 11 THEN cents ELSE 0 END) AS BIGINT) AS wb_q4b,
             CAST(sum(cents) AS BIGINT) AS total_cents
      FROM chan
      WHERE yr BETWEEN 1996 AND 1997
      GROUP BY sk, yr
      ORDER BY sk, yr"""

  // Q75: year-over-year DECLINE — a channel UNION grouped by
  // (year, brand) is consumed twice (current and prior year) through a
  // self-join on brand, keeping only brands whose quantity declined;
  // the deltas are exact integer subtractions. The "grouped union
  // frame self-joined across periods with an inequality residual"
  // shape (TPC-DS catalog/store/web yearly sales decline).
  private val q75 = """
      WITH sales AS (
        SELECT CAST(year(l_shipdate) AS INT) AS yr, p_brand AS brand,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
               CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM (
          SELECT l_partkey, l_quantity, l_extendedprice, l_shipdate
          FROM lineitem WHERE l_linestatus = 'F'
          UNION ALL
          SELECT l_partkey, l_quantity, l_extendedprice, l_shipdate
          FROM lineitem WHERE l_linestatus = 'O' AND l_returnflag <> 'R') u
        JOIN part ON p_partkey = l_partkey
        WHERE year(l_shipdate) IN (1996, 1997)
        GROUP BY 1, 2)
      SELECT c.brand AS brand,
             p.qty AS qty_prev, c.qty AS qty_cur,
             CAST(c.qty - p.qty AS BIGINT) AS qty_delta,
             CAST(c.cents - p.cents AS BIGINT) AS cents_delta
      FROM sales c JOIN sales p ON c.brand = p.brand
      WHERE c.yr = 1997 AND p.yr = 1996 AND c.qty < p.qty
      ORDER BY brand"""

  // Q93: returns-ADJUSTED sales — the fact LEFT JOINs its returns leg
  // on the (order, part) business key; matched rows reduce the billed
  // quantity by the returned quantity (floored at zero), unmatched
  // rows pass through via the null-aware CASE. Summed per customer
  // with a HAVING floor. The "left join + null-aware quantity
  // adjustment" shape (TPC-DS store_sales ⟕ store_returns).
  private val q93 = """
      WITH returns AS (
        SELECT l_orderkey AS okey, l_partkey AS pkey,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS ret_qty
        FROM lineitem WHERE l_returnflag = 'R'
        GROUP BY 1, 2),
      adjusted AS (
        SELECT f.l_orderkey,
               CASE WHEN r.okey IS NULL THEN CAST(l_quantity AS BIGINT)
                    WHEN CAST(l_quantity AS BIGINT) > r.ret_qty
                      THEN CAST(l_quantity AS BIGINT) - r.ret_qty
                    ELSE 0 END AS act_qty,
               CAST(floor(f.l_extendedprice * 100) AS BIGINT) AS unit_cents_x
        FROM lineitem f LEFT JOIN returns r
          ON f.l_orderkey = r.okey AND f.l_partkey = r.pkey
        WHERE f.l_returnflag <> 'R')
      SELECT o_custkey AS custkey,
             CAST(sum(act_qty) AS BIGINT) AS act_qty,
             CAST(sum(act_qty * unit_cents_x) AS BIGINT) AS act_cents
      FROM adjusted JOIN orders ON o_orderkey = l_orderkey
      GROUP BY o_custkey
      HAVING sum(act_qty) > 400
      ORDER BY custkey"""

  // Q99/Q62: shipping-lag BUCKET pivot — each order/line pair lands in
  // one of five latency buckets via interval comparisons (no
  // engine-specific datediff), counted per order priority. The
  // "bucketed CASE counts over a fact-dim join" shape.
  private val q99 = """
      SELECT o_orderpriority AS priority,
             CAST(sum(CASE WHEN l_shipdate < o_orderdate + INTERVAL '30' DAY THEN 1 ELSE 0 END) AS BIGINT) AS d30,
             CAST(sum(CASE WHEN l_shipdate >= o_orderdate + INTERVAL '30' DAY
                            AND l_shipdate < o_orderdate + INTERVAL '60' DAY THEN 1 ELSE 0 END) AS BIGINT) AS d60,
             CAST(sum(CASE WHEN l_shipdate >= o_orderdate + INTERVAL '60' DAY
                            AND l_shipdate < o_orderdate + INTERVAL '90' DAY THEN 1 ELSE 0 END) AS BIGINT) AS d90,
             CAST(sum(CASE WHEN l_shipdate >= o_orderdate + INTERVAL '90' DAY
                            AND l_shipdate < o_orderdate + INTERVAL '120' DAY THEN 1 ELSE 0 END) AS BIGINT) AS d120,
             CAST(sum(CASE WHEN l_shipdate >= o_orderdate + INTERVAL '120' DAY THEN 1 ELSE 0 END) AS BIGINT) AS d_more
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderdate >= @TS'1996-01-01 00:00:00'
        AND o_orderdate < @TS'1998-01-01 00:00:00'
      GROUP BY o_orderpriority
      ORDER BY priority"""

  // Q21: before/after PIVOT-DATE ratio — per-supplier quantity split
  // around a pivot date by conditional sums, then a HAVING band keeps
  // suppliers whose after/before ratio lies in [2/3, 3/2], compared by
  // integer cross-multiplication (no float boundary). The
  // "conditional split + ratio-band HAVING" shape (TPC-DS inventory
  // before/after).
  private val q21 = """
      SELECT l_suppkey AS sk,
             CAST(sum(CASE WHEN l_shipdate < @TS'1997-07-01 00:00:00'
                           THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS qty_before,
             CAST(sum(CASE WHEN l_shipdate >= @TS'1997-07-01 00:00:00'
                           THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS qty_after
      FROM lineitem
      WHERE l_shipdate >= @TS'1997-01-01 00:00:00'
        AND l_shipdate < @TS'1998-01-01 00:00:00'
      GROUP BY l_suppkey
      HAVING sum(CASE WHEN l_shipdate < @TS'1997-07-01 00:00:00'
                      THEN CAST(l_quantity AS BIGINT) ELSE 0 END) > 0
         AND 3 * sum(CASE WHEN l_shipdate >= @TS'1997-07-01 00:00:00'
                          THEN CAST(l_quantity AS BIGINT) ELSE 0 END)
             >= 2 * sum(CASE WHEN l_shipdate < @TS'1997-07-01 00:00:00'
                             THEN CAST(l_quantity AS BIGINT) ELSE 0 END)
         AND 3 * sum(CASE WHEN l_shipdate < @TS'1997-07-01 00:00:00'
                          THEN CAST(l_quantity AS BIGINT) ELSE 0 END)
             >= 2 * sum(CASE WHEN l_shipdate >= @TS'1997-07-01 00:00:00'
                             THEN CAST(l_quantity AS BIGINT) ELSE 0 END)
      ORDER BY sk"""

  // Q54: HISTOGRAM over an aggregate — per-customer revenue is
  // re-aggregated into fixed-width revenue buckets, counting customers
  // per bucket: two stacked hash aggregates where the second's key is
  // derived from the first's measure (the segment-count shape).
  private val q54 = """
      WITH rev AS (
        SELECT o_custkey,
               CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM orders GROUP BY o_custkey)
      SELECT CAST(floor(cents / 5000000) AS BIGINT) AS bucket,
             CAST(count(*) AS BIGINT) AS n_cust
      FROM rev
      GROUP BY 1
      ORDER BY bucket"""

  // Q9: scalar-subquery CASE ladder — five SELECT-list buckets, each
  // choosing between two further scalar aggregates based on a count
  // threshold; fifteen independent scalar subqueries over one fact
  // that Catalyst plans as one-row aggregates joined in (never
  // per-row re-execution). All-integer outputs.
  private val q9 = """
      SELECT
        CASE WHEN (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 1 AND 10) > 2000
             THEN (SELECT CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                   FROM lineitem WHERE l_quantity BETWEEN 1 AND 10)
             ELSE (SELECT CAST(count(*) AS BIGINT) FROM lineitem WHERE l_quantity BETWEEN 1 AND 10)
        END AS bucket1,
        CASE WHEN (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 11 AND 20) > 2000
             THEN (SELECT CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                   FROM lineitem WHERE l_quantity BETWEEN 11 AND 20)
             ELSE (SELECT CAST(count(*) AS BIGINT) FROM lineitem WHERE l_quantity BETWEEN 11 AND 20)
        END AS bucket2,
        CASE WHEN (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 21 AND 30) > 2000
             THEN (SELECT CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                   FROM lineitem WHERE l_quantity BETWEEN 21 AND 30)
             ELSE (SELECT CAST(count(*) AS BIGINT) FROM lineitem WHERE l_quantity BETWEEN 21 AND 30)
        END AS bucket3,
        CASE WHEN (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 31 AND 40) > 2000
             THEN (SELECT CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                   FROM lineitem WHERE l_quantity BETWEEN 31 AND 40)
             ELSE (SELECT CAST(count(*) AS BIGINT) FROM lineitem WHERE l_quantity BETWEEN 31 AND 40)
        END AS bucket4,
        CASE WHEN (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 41 AND 50) > 2000
             THEN (SELECT CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                   FROM lineitem WHERE l_quantity BETWEEN 41 AND 50)
             ELSE (SELECT CAST(count(*) AS BIGINT) FROM lineitem WHERE l_quantity BETWEEN 41 AND 50)
        END AS bucket5
      FROM region
      WHERE r_regionkey = 0"""

  // Q44: best/worst performers — one grouped frame ranked twice
  // (ascending and descending), the two rankings equi-joined on rank
  // index so row k pairs the k-th best with the k-th worst. Rank
  // frames are WindowGroupLimit-prunable; the pair join is an
  // equi-join on the rank ordinal.
  private val q44 = """
      WITH perf AS (
        SELECT l_suppkey AS sk,
               CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS net_cents
        FROM lineitem WHERE l_returnflag <> 'R'
        GROUP BY l_suppkey),
      best AS (
        SELECT sk, net_cents, row_number() OVER (ORDER BY net_cents DESC, sk) AS rnk
        FROM perf),
      worst AS (
        SELECT sk, net_cents, row_number() OVER (ORDER BY net_cents ASC, sk) AS rnk
        FROM perf)
      SELECT b.rnk AS rnk, b.sk AS best_sk, b.net_cents AS best_cents,
             w.sk AS worst_sk, w.net_cents AS worst_cents
      FROM best b JOIN worst w ON b.rnk = w.rnk
      WHERE b.rnk <= 10
      ORDER BY rnk"""

  // Q76: "null-attribute" channel union — each channel scan LEFT JOINs
  // a restrictive dim slice so misses surface as NULLs, and the union
  // counts rows + null-dim rows per (channel, flag): the
  // null-producing-join-into-union-aggregate shape.
  private val q76 = """
      WITH chan AS (
        SELECT 'store' AS channel, l_returnflag AS flag, p.p_brand AS brand,
               CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents
        FROM lineitem LEFT JOIN part p
          ON p.p_partkey = l_partkey AND p.p_size > 40
        WHERE l_linestatus = 'F'
        UNION ALL
        SELECT 'web', l_returnflag, p.p_brand,
               CAST(floor(l_extendedprice * 100) AS BIGINT)
        FROM lineitem LEFT JOIN part p
          ON p.p_partkey = l_partkey AND p.p_size <= 10
        WHERE l_linestatus = 'O')
      SELECT channel, flag,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CASE WHEN brand IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nullbrand,
             CAST(sum(cents) AS BIGINT) AS cents
      FROM chan
      GROUP BY channel, flag
      ORDER BY channel, flag"""

  // Q38: customers present in ALL THREE channels — INTERSECT chain of
  // three DISTINCT channel frames (Catalyst rewrites each INTERSECT to
  // a left-semi join), collapsed to one audit row.
  private val q38 = """
      WITH store AS (SELECT DISTINCT o.o_custkey AS ck
                     FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
                     WHERE l.l_returnflag = 'A'),
      web AS (SELECT DISTINCT o.o_custkey AS ck
              FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
              WHERE l.l_returnflag = 'N'),
      cat AS (SELECT DISTINCT o.o_custkey AS ck
              FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
              WHERE l.l_returnflag = 'R'),
      common AS (SELECT ck FROM store INTERSECT SELECT ck FROM web
                 INTERSECT SELECT ck FROM cat)
      SELECT CAST(count(*) AS BIGINT) AS n_common,
             CAST(sum(ck) AS BIGINT) AS ck_sum
      FROM common"""

  // Q87: customers in the store channel but in NEITHER other channel —
  // an EXCEPT chain (anti-join rewrites), same channel frames as Q38.
  private val q87 = """
      WITH store AS (SELECT DISTINCT o.o_custkey AS ck
                     FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
                     WHERE l.l_returnflag = 'A'),
      web AS (SELECT DISTINCT o.o_custkey AS ck
              FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
              WHERE l.l_returnflag = 'N'),
      cat AS (SELECT DISTINCT o.o_custkey AS ck
              FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
              WHERE l.l_returnflag = 'R'),
      only_store AS (SELECT ck FROM store EXCEPT SELECT ck FROM web
                     EXCEPT SELECT ck FROM cat)
      SELECT CAST(count(*) AS BIGINT) AS n_only_store,
             CAST(sum(ck) AS BIGINT) AS ck_sum
      FROM only_store"""

  // Q90: ratio of two disjoint time-band counts — two single-row
  // aggregates cross-joined, division on the integer ppm grid.
  private val q90 = """
      WITH am AS (SELECT CAST(count(*) AS BIGINT) AS amc FROM events
                  WHERE CAST(extract(hour FROM ts) AS INT) BETWEEN 6 AND 11),
      pm AS (SELECT CAST(count(*) AS BIGINT) AS pmc FROM events
             WHERE CAST(extract(hour FROM ts) AS INT) BETWEEN 18 AND 23)
      SELECT amc, pmc, (amc * 1000000) @IDIV pmc AS ratio_ppm
      FROM am, pm"""

  // Q41: EXISTS over a deep OR-of-AND predicate tree — the planner
  // must push the correlation key through the disjunction and plan ONE
  // semi join, not one per branch.
  private val q41 = """
      SELECT p_brand, CAST(count(*) AS BIGINT) AS n_parts
      FROM part p
      WHERE p_size BETWEEN 1 AND 20 AND EXISTS (
        SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey AND (
          (l.l_quantity BETWEEN 1 AND 10 AND l.l_returnflag = 'A'
             AND l.l_discount BETWEEN 0.00 AND 0.04)
          OR (l.l_quantity BETWEEN 20 AND 30 AND l.l_returnflag = 'R'
             AND l.l_tax >= 0.04)
          OR (l.l_quantity BETWEEN 40 AND 50 AND l.l_linestatus = 'O'
             AND l.l_discount >= 0.06)))
      GROUP BY p_brand ORDER BY p_brand"""

  // Q94: orders fulfilled by MORE THAN ONE supplier (correlated scalar
  // count-distinct, decorrelated to an aggregate join) with NO
  // returned line (anti join) — the ship-confirmation shape.
  private val q94 = """
      SELECT o_orderpriority,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM orders o
      WHERE o.o_orderstatus = 'F'
        AND (SELECT count(DISTINCT l1.l_suppkey) FROM lineitem l1
             WHERE l1.l_orderkey = o.o_orderkey) > 1
        AND NOT EXISTS (SELECT 1 FROM lineitem l2
                        WHERE l2.l_orderkey = o.o_orderkey
                          AND l2.l_returnflag = 'R')
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  // Q72: date-offset theta condition INSIDE an equi join — lines
  // shipped more than 60 days after their order, bucketed per month;
  // the planner keeps the equi key for the shuffle and evaluates the
  // interval comparison as a post-join filter.
  private val q72 = """
      SELECT CAST(extract(month FROM o.o_orderdate) AS INT) AS order_month,
             CAST(count(*) AS BIGINT) AS n_late,
             CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem l JOIN orders o
        ON l.l_orderkey = o.o_orderkey
       AND l.l_shipdate > o.o_orderdate + INTERVAL '60' DAY
      GROUP BY CAST(extract(month FROM o.o_orderdate) AS INT)
      ORDER BY order_month"""

  // Q98/Q20: share-of-class revenue — a WINDOW SUM over the grouped
  // aggregate (partition total), ratio on the integer ppm grid. The
  // ppm is floor(double) rather than BIGINT `cents * 1000000 div …`:
  // group cents reach ~4e13 at sf10 (60M lineitem), so the integer
  // numerator overflows Long at exactly the scale this engine targets
  // (caught by the r14 sf10 sweep under ANSI). cents < 2^53 converts
  // to double exactly and *, /, floor are IEEE-deterministic, so both
  // engines compute the identical ppm at any realistic scale.
  private val q98 = """
      WITH rev AS (
        SELECT l_returnflag AS class, l_linestatus AS item,
               CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus)
      SELECT class, item, cents,
             CAST(floor(CAST(cents AS DOUBLE) * 1000000 /
                        CAST(sum(cents) OVER (PARTITION BY class) AS DOUBLE)) AS BIGINT)
               AS share_ppm
      FROM rev
      ORDER BY class, item"""

  // Q15: a top-level OR across unrelated predicate families (IN-list,
  // string prefix, numeric threshold) — the planner must keep ONE scan
  // with the disjunction, not a union of three.
  private val q15 = """
      SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM orders
      WHERE o_orderstatus IN ('F', 'P')
         OR substring(o_orderpriority, 1, 1) = '1'
         OR o_totalprice > 250000
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority"""

  // Q37/Q82: a dim sliced by a range filter drives a semi join into
  // the fact; output the distinct surviving dim rows.
  private val q37 = """
      SELECT p_brand, CAST(count(*) AS BIGINT) AS n_parts
      FROM part p
      WHERE p_size BETWEEN 25 AND 35
        AND p_retailprice BETWEEN 900 AND 1500
        AND EXISTS (SELECT 1 FROM lineitem l
                    WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 30)
      GROUP BY p_brand
      ORDER BY p_brand"""

  // Q92/Q32 family: "excess discount" — rows priced above a multiple
  // of the per-key average of the SAME fact, expressed as TWO
  // correlated scalar aggregates (count and sum) so the threshold
  // compare is cross-multiplied on the integer-cent grid (10*cents*n >
  // 13*sum_cents ⟺ cents > 1.3*avg, no float boundary). The planner
  // must decorrelate both scalars into aggregate self-joins of the
  // fact — the distinctive stress of this query family.
  private val q92 = """
      SELECT CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS excess_cents,
             CAST(count(*) AS BIGINT) AS n_excess
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_size BETWEEN 20 AND 30
        AND 10 * CAST(floor(l.l_extendedprice * 100) AS BIGINT)
              * (SELECT count(*) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
            > 13 * (SELECT sum(CAST(floor(l3.l_extendedprice * 100) AS BIGINT))
                    FROM lineitem l3 WHERE l3.l_partkey = l.l_partkey)"""

  // Q6 family: customers (per geography) who bought items priced at
  // least 1.04x the average (the synthetic price spread tops out at 1.06x, so the classic 1.2 never fires; 26/25 keeps the compare integral) of the item's category, counted with a
  // HAVING floor — category average again via paired correlated
  // scalars on the dim, cross-multiplied in BIGINT.
  private val q6 = """
      SELECT n.n_name, CAST(count(DISTINCT c.c_custkey) AS BIGINT) AS n_cust
      FROM customer c
      JOIN orders o ON o.o_custkey = c.c_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      WHERE o.o_orderdate >= @TS '1995-01-01 00:00:00'
        AND o.o_orderdate < @TS '1997-01-01 00:00:00'
        AND 25 * CAST(floor(p.p_retailprice * 100) AS BIGINT)
              * (SELECT count(*) FROM part p2 WHERE p2.p_type = p.p_type)
            > 26 * (SELECT sum(CAST(floor(p3.p_retailprice * 100) AS BIGINT))
                    FROM part p3 WHERE p3.p_type = p.p_type)
      GROUP BY n.n_name
      HAVING count(DISTINCT c.c_custkey) >= 10
      ORDER BY n.n_name"""

  // Q22 family: inventory-style ROLLUP over the item hierarchy
  // (brand, type, size) of AVERAGE quantity across a two-year date
  // bucket — integer-division average on the cent grid, GROUPING()
  // marking subtotal levels.
  private val nq_q22_rollup_avg_qty = """
      SELECT p.p_brand, p.p_type, p.p_size,
             CAST(grouping(p.p_brand) + grouping(p.p_type) + grouping(p.p_size) AS INT) AS lvl,
             (100 * CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT))
               @IDIV CAST(count(*) AS BIGINT) AS qty_avg_c,
             CAST(count(*) AS BIGINT) AS n
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE l.l_shipdate >= @TS'1996-01-01 00:00:00'
        AND l.l_shipdate < @TS'1998-01-01 00:00:00'
      GROUP BY ROLLUP(p.p_brand, p.p_type, p.p_size)
      ORDER BY lvl, p_brand NULLS FIRST, p_type NULLS FIRST, p_size NULLS FIRST"""

  // Q11/Q74 family: two-channel year-over-year preference — per-
  // (customer, year, channel) totals self-joined four ways, customers
  // kept when the web growth ratio beats the store growth ratio
  // (cross-multiplied in BIGINT, no float boundary).
  private val nq_q11_yoy_preference = """
      WITH yr AS (
        SELECT o.o_custkey AS ck, CAST(year(o.o_orderdate) AS INT) AS y,
               l.l_linestatus AS chan,
               sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS cents
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE year(o.o_orderdate) IN (1995, 1996)
        GROUP BY 1, 2, 3)
      SELECT s1.ck AS c_custkey,
             CAST(s1.cents AS BIGINT) AS store_y1, CAST(s2.cents AS BIGINT) AS store_y2,
             CAST(w1.cents AS BIGINT) AS web_y1, CAST(w2.cents AS BIGINT) AS web_y2
      FROM yr s1 JOIN yr s2 ON s1.ck = s2.ck
      JOIN yr w1 ON s1.ck = w1.ck
      JOIN yr w2 ON s1.ck = w2.ck
      WHERE s1.chan = 'F' AND s1.y = 1995 AND s2.chan = 'F' AND s2.y = 1996
        AND w1.chan = 'O' AND w1.y = 1995 AND w2.chan = 'O' AND w2.y = 1996
        AND s1.cents > 0 AND w1.cents > 0
        AND w2.cents * s1.cents > s2.cents * w1.cents
      ORDER BY c_custkey"""

  // Q57 family (the call-center variant of Q47): monthly supplier
  // sales whose deviation from the per-(supplier, year) average
  // exceeds 30% — the |v − avg| > k·avg filter cross-multiplied to
  // 10·|n·v − S| > 3·S over window sums — with lag/lead month
  // neighbors riding along.
  private val nq_q57_deviation_lag = """
      WITH m AS (
        SELECT s.s_nationkey AS nk, l.l_suppkey AS sk,
               CAST(year(l.l_shipdate) AS INT) AS y, CAST(month(l.l_shipdate) AS INT) AS mo,
               sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS v
        FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
        WHERE year(l.l_shipdate) IN (1996, 1997)
        GROUP BY 1, 2, 3, 4),
      t AS (
        SELECT nk, sk, y, mo, v,
               CAST(sum(v) OVER (PARTITION BY sk, y) AS BIGINT) AS ytot,
               CAST(count(*) OVER (PARTITION BY sk, y) AS BIGINT) AS nmo,
               lag(v) OVER (PARTITION BY sk ORDER BY y, mo) AS prev_v,
               lead(v) OVER (PARTITION BY sk ORDER BY y, mo) AS next_v
        FROM m)
      SELECT nk, sk, y, mo, CAST(v AS BIGINT) AS v,
             CAST(prev_v AS BIGINT) AS prev_v, CAST(next_v AS BIGINT) AS next_v
      FROM t
      WHERE 10 * abs(nmo * v - ytot) > 3 * ytot AND y = 1996
      ORDER BY nk, sk, y, mo"""

  // Q25/Q29 family: three-fact chain — a store-channel sale joined
  // to a later return by the same (customer, part), joined to a
  // later web-channel re-purchase, quantity sums per brand.
  private val nq_q29_three_fact_qty = """
      WITH sales AS (
        SELECT o.o_custkey AS ck, l.l_partkey AS pk, l.l_quantity AS q, o.o_orderdate AS d
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_linestatus = 'F' AND l.l_returnflag <> 'R'
          AND o.o_orderdate >= @TS'1995-01-01 00:00:00'
          AND o.o_orderdate < @TS'1996-01-01 00:00:00'),
      ret AS (
        SELECT o.o_custkey AS ck, l.l_partkey AS pk, l.l_quantity AS q, o.o_orderdate AS d
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_returnflag = 'R'),
      rebuy AS (
        SELECT o.o_custkey AS ck, l.l_partkey AS pk, l.l_quantity AS q, o.o_orderdate AS d
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_linestatus = 'O')
      SELECT p.p_brand,
             CAST(sum(CAST(s.q AS BIGINT)) AS BIGINT) AS qty_sold,
             CAST(sum(CAST(r.q AS BIGINT)) AS BIGINT) AS qty_returned,
             CAST(sum(CAST(b.q AS BIGINT)) AS BIGINT) AS qty_rebought
      FROM sales s
      JOIN ret r ON r.ck = s.ck AND r.pk = s.pk AND r.d >= s.d
      JOIN rebuy b ON b.ck = r.ck AND b.pk = r.pk AND b.d >= r.d
      JOIN part p ON p.p_partkey = s.pk
      GROUP BY p.p_brand
      ORDER BY p.p_brand"""

  // Q16/Q69 family: EXISTS (store channel) AND NOT EXISTS (web
  // channel) in the same period — LeftSemi + LeftAnti on the same
  // fact — grouped by demographic (segment, balance band).
  private val nq_q69_channel_anti_demo = """
      SELECT c.c_mktsegment,
             CAST(floor(c.c_acctbal / 1000) AS BIGINT) AS bal_band,
             CAST(count(*) AS BIGINT) AS n_cust
      FROM customer c
      WHERE EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
                AND o.o_orderdate >= @TS'1996-01-01 00:00:00'
                AND o.o_orderdate < @TS'1997-01-01 00:00:00')
        AND NOT EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O'
                AND o.o_orderdate >= @TS'1996-01-01 00:00:00'
                AND o.o_orderdate < @TS'1997-01-01 00:00:00')
      GROUP BY 1, 2
      ORDER BY c_mktsegment, bal_band"""

  // Q77/Q80 family: per-channel P&L — sales and returns aggregated
  // separately per nation, FULL OUTER joined (a nation can have
  // returns without sales in a channel), channels UNION ALL'd, then
  // ROLLUP totals with profit netting.
  private val nq_q77_pnl_rollup = """
      WITH ss AS (
        SELECT s.s_nationkey AS nk, sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS sales
        FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
        WHERE l.l_linestatus = 'F' AND l.l_returnflag <> 'R' GROUP BY 1),
      sr AS (
        SELECT s.s_nationkey AS nk, sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS ret
        FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
        WHERE l.l_linestatus = 'F' AND l.l_returnflag = 'R' GROUP BY 1),
      ws AS (
        SELECT s.s_nationkey AS nk, sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS sales
        FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
        WHERE l.l_linestatus = 'O' AND l.l_returnflag <> 'R' GROUP BY 1),
      wr AS (
        SELECT s.s_nationkey AS nk, sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS ret
        FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
        WHERE l.l_linestatus = 'O' AND l.l_returnflag = 'R' GROUP BY 1),
      channels AS (
        SELECT 'store' AS channel, COALESCE(ss.nk, sr.nk) AS nk,
               COALESCE(ss.sales, 0) AS sales, COALESCE(sr.ret, 0) AS returns
        FROM ss FULL OUTER JOIN sr ON ss.nk = sr.nk
        UNION ALL
        SELECT 'web', COALESCE(ws.nk, wr.nk),
               COALESCE(ws.sales, 0), COALESCE(wr.ret, 0)
        FROM ws FULL OUTER JOIN wr ON ws.nk = wr.nk)
      SELECT channel, nk,
             CAST(grouping(channel) + grouping(nk) AS INT) AS lvl,
             CAST(sum(sales) AS BIGINT) AS sales,
             CAST(sum(returns) AS BIGINT) AS returns,
             CAST(sum(sales) - sum(returns) AS BIGINT) AS profit
      FROM channels
      GROUP BY ROLLUP(channel, nk)
      ORDER BY lvl, channel NULLS FIRST, nk NULLS FIRST"""

  // Q3/Q42/Q52/Q55 family: the canonical star — date-slice fact
  // scan joined to the item dim, revenue per (year, brand).
  private val nq_q3_brand_date_agg = """
      SELECT CAST(year(l.l_shipdate) AS INT) AS y, p.p_brand,
             CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE month(l.l_shipdate) = 12 AND p.p_type IN ('ECONOMY', 'PROMO')
      GROUP BY 1, 2
      ORDER BY y, rev_cents DESC, p_brand"""

  // Q7/Q26 family: per-brand average quantity and price under
  // customer-segment and order-priority demographic filters —
  // integer-division averages.
  private val nq_q7_demo_avg = """
      SELECT p.p_brand,
             (100 * CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT))
               @IDIV CAST(count(*) AS BIGINT) AS qty_avg_c,
             (CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT))
               @IDIV CAST(count(*) AS BIGINT) AS price_avg_c,
             CAST(count(*) AS BIGINT) AS n
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderpriority LIKE '1-%'
      GROUP BY p.p_brand
      ORDER BY p.p_brand"""

  // Q13/Q48 family: one aggregate row over OR'd (segment, balance
  // band, quantity band) triples — disjunctive band predicates that
  // defeat static pruning.
  private val nq_q13_or_banded_avg = """
      SELECT CAST(count(*) AS BIGINT) AS n,
             (100 * CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT))
               @IDIV CAST(count(*) AS BIGINT) AS qty_avg_c,
             CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      WHERE (c.c_mktsegment = 'AUTOMOBILE' AND c.c_acctbal BETWEEN 0 AND 3000
               AND l.l_quantity BETWEEN 1 AND 15)
         OR (c.c_mktsegment = 'MACHINERY' AND c.c_acctbal BETWEEN 3000 AND 6000
               AND l.l_quantity BETWEEN 16 AND 35)
         OR (c.c_mktsegment = 'HOUSEHOLD' AND c.c_acctbal BETWEEN 6000 AND 10000
               AND l.l_quantity BETWEEN 36 AND 50)"""

  // Q19 family: brand revenue where the CUSTOMER's nation differs
  // from the SUPPLIER's (the buyer-zip <> store-zip analog) — a
  // five-table star with a cross-dim inequality.
  // The geo-mismatch filter sits in a MATERIALIZED CTE ABOVE the
  // equi-join chain: left in the flat WHERE, DuckDB (the oracle
  // engine) planned customer×supplier as a NESTED_LOOP_JOIN on the
  // <> predicate at sf10 — 1.5e11 pairs before any equi key applied
  // (found by the sf10 sweep; identical results either way)
  private val nq_q19_brand_geo_mismatch = """
      WITH j AS @MAT (
        SELECT p.p_brand, l.l_extendedprice, c.c_nationkey AS cn, s.s_nationkey AS sn
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE month(o.o_orderdate) = 11)
      SELECT p_brand,
             CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
      FROM j
      WHERE cn <> sn
      GROUP BY p_brand
      ORDER BY p_brand"""

  // Q24 family: per-(customer, type) net paid, kept when above a
  // scalar share of the overall average — the CTE consumed three
  // times (rows, scalar count, scalar sum), cross-multiplied.
  private val nq_q24_netpaid_above_avg = """
      WITH paid AS (
        SELECT c.c_custkey AS ck, p.p_type AS pt,
               sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS cents
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE l.l_returnflag <> 'R'
        GROUP BY 1, 2)
      SELECT ck AS c_custkey, pt AS p_type, CAST(cents AS BIGINT) AS cents
      FROM paid
      WHERE cents * (SELECT count(*) FROM paid) * 10
            > (SELECT sum(cents) FROM paid) * 25
      ORDER BY ck, pt"""

  // Q28 family: disjoint quantity-band scans each computing
  // (integer avg, count, COUNT DISTINCT on the cent grid),
  // cross-joined into a single row — three scans, no join keys.
  private val nq_q28_banded_distinct = """
      SELECT b1.a1, b1.n1, b1.d1, b2.a2, b2.n2, b2.d2, b3.a3, b3.n3, b3.d3
      FROM
        (SELECT (CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT))
                  @IDIV CAST(count(*) AS BIGINT) AS a1,
                CAST(count(*) AS BIGINT) AS n1,
                CAST(count(DISTINCT CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS d1
         FROM lineitem WHERE l_quantity BETWEEN 1 AND 10) b1,
        (SELECT (CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT))
                  @IDIV CAST(count(*) AS BIGINT) AS a2,
                CAST(count(*) AS BIGINT) AS n2,
                CAST(count(DISTINCT CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS d2
         FROM lineitem WHERE l_quantity BETWEEN 11 AND 25) b2,
        (SELECT (CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT))
                  @IDIV CAST(count(*) AS BIGINT) AS a3,
                CAST(count(*) AS BIGINT) AS n3,
                CAST(count(DISTINCT CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS d3
         FROM lineitem WHERE l_quantity BETWEEN 26 AND 50) b3"""

  // Q30/Q81 family: customers whose return total exceeds 1.2x
  // their nation's average — correlated scalar count and sum against
  // the same returns CTE, cross-multiplied.
  private val nq_q30_return_ratio_state = """
      WITH cr AS (
        SELECT c.c_custkey AS ck, c.c_nationkey AS nk,
               sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS ret
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        WHERE l.l_returnflag = 'R'
        GROUP BY 1, 2)
      SELECT c1.ck AS c_custkey, CAST(c1.ret AS BIGINT) AS ret_cents
      FROM cr c1
      WHERE c1.ret * (SELECT count(*) FROM cr c2 WHERE c2.nk = c1.nk) * 10
            > (SELECT sum(c2.ret) FROM cr c2 WHERE c2.nk = c1.nk) * 12
      ORDER BY c_custkey"""

  // Q45 family: geography list OR item-list semi-join — the
  // disjunction of a dim-value filter and an IN-subquery, which
  // forces an existence-join rather than a plain semi.
  private val nq_q45_zip_or_itemlist = """
      SELECT n.n_name, CAST(year(o.o_orderdate) AS INT) AS y,
             CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      WHERE n.n_name IN ('FRANCE', 'GERMANY', 'JAPAN', 'BRAZIL')
         OR l.l_partkey IN (SELECT p_partkey FROM part WHERE p_size <= 3)
      GROUP BY 1, 2
      ORDER BY n_name, y"""

  // Q46/Q68/Q73/Q79 family: per-order item-count HAVING band
  // (the store-ticket bucket), joined back to the customer dim.
  private val nq_q46_ticket_buckets = """
      WITH t AS (
        SELECT o.o_orderkey AS okey, o.o_custkey AS ck,
               count(*) AS n_items,
               sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS cents
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2
        HAVING count(*) BETWEEN 5 AND 7)
      SELECT c.c_name, t.okey AS o_orderkey, CAST(t.n_items AS BIGINT) AS n_items,
             CAST(t.cents AS BIGINT) AS cents
      FROM t JOIN customer c ON c.c_custkey = t.ck
      ORDER BY c_name, o_orderkey"""

  // Q61 family: promotional-to-total revenue ratio — two scalar
  // aggregates cross-joined, basis points via integer division.
  private val nq_q61_promo_ratio = """
      SELECT CAST(promo.cents AS BIGINT) AS promo_cents,
             CAST(total.cents AS BIGINT) AS total_cents,
             CAST((promo.cents * 10000) @IDIV total.cents AS BIGINT) AS ratio_bp
      FROM
        (SELECT sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS cents
         FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         WHERE o.o_orderpriority = '1-URGENT'
           AND year(o.o_orderdate) = 1996) promo,
        (SELECT sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS cents
         FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         WHERE year(o.o_orderdate) = 1996) total"""

  // Q65 family: (supplier, part) revenue at or below 40% of the
  // supplier's average part revenue — aggregate-over-aggregate with
  // the comparison cross-multiplied by the part count.
  private val nq_q65_best_seller = """
      WITH sp AS (
        SELECT l_suppkey AS sk, l_partkey AS pk,
               sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS rev
        FROM lineitem GROUP BY 1, 2),
      sa AS (
        SELECT sk, sum(rev) AS tot, count(*) AS n FROM sp GROUP BY 1)
      SELECT s.s_name, p.p_name, CAST(sp.rev AS BIGINT) AS rev_cents
      FROM sp
      JOIN sa ON sa.sk = sp.sk
      JOIN supplier s ON s.s_suppkey = sp.sk
      JOIN part p ON p.p_partkey = sp.pk
      WHERE sp.rev * sa.n * 10 <= sa.tot * 4
      ORDER BY s_name, p_name"""

  // Q53/Q63/Q89 family: monthly brand sales vs the brand-year
  // average via window sums — deviation filter 10·|n·v − S| > 2·S,
  // all integer.
  private val nq_q89_monthly_vs_class_avg = """
      WITH m AS (
        SELECT p.p_brand AS brand, CAST(year(l.l_shipdate) AS INT) AS y,
               CAST(month(l.l_shipdate) AS INT) AS mo,
               sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS v
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE year(l.l_shipdate) = 1997
        GROUP BY 1, 2, 3),
      t AS (
        SELECT brand, y, mo, v,
               CAST(sum(v) OVER (PARTITION BY brand, y) AS BIGINT) AS ytot,
               CAST(count(*) OVER (PARTITION BY brand, y) AS BIGINT) AS nmo
        FROM m)
      SELECT brand, y, mo, CAST(v AS BIGINT) AS v, ytot, nmo
      FROM t
      WHERE 10 * abs(nmo * v - ytot) > 2 * ytot
      ORDER BY brand, y, mo"""

  // Q84/Q85/Q91 family: returns joined through customer and nation
  // dims under OR'd (balance band, quantity band) pairs, integer
  // average quantity per order priority.
  private val nq_q85_multi_dim_filter = """
      SELECT o.o_orderpriority,
             (100 * CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT))
               @IDIV CAST(count(*) AS BIGINT) AS qty_avg_c,
             CAST(count(*) AS BIGINT) AS n
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      WHERE l.l_returnflag = 'R'
        AND ((c.c_acctbal BETWEEN 0 AND 5000 AND l.l_quantity BETWEEN 1 AND 25)
          OR (c.c_acctbal BETWEEN 5000 AND 10000 AND l.l_quantity BETWEEN 26 AND 50))
        AND n.n_name IN ('NATION_2', 'NATION_5', 'NATION_8', 'NATION_11', 'NATION_17', 'NATION_21')
      GROUP BY o.o_orderpriority
      ORDER BY o_orderpriority"""

  // Q8 family: revenue gated by a name-prefix nation subquery with
  // a scale-free HAVING (nations holding more than an equal share of
  // customers) — semi-join on a grouped+filtered dim.
  private val nq_q8_nation_prefix_semi = """
      SELECT p.p_brand,
             CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE c.c_nationkey IN (
              SELECT c2.c_nationkey FROM customer c2
              JOIN nation n2 ON n2.n_nationkey = c2.c_nationkey
              WHERE substr(n2.n_name, 8, 1) IN ('1', '3', '5', '7', '9')
              GROUP BY c2.c_nationkey
              HAVING count(*) * 25 > (SELECT count(*) FROM customer))
        AND year(o.o_orderdate) = 1997
      GROUP BY p.p_brand
      ORDER BY p_brand"""

  // Q18/Q27 family: ROLLUP of integer-division AVERAGES over
  // demographic dims (segment, nation) under an order-priority filter
  // — the "averages at every subtotal level" pattern, which is NOT a
  // re-aggregation of sums (each level recomputes its own count).
  private val nq_q27_demo_rollup_avg = """
      SELECT c.c_mktsegment, n.n_name,
             CAST(grouping(c.c_mktsegment) + grouping(n.n_name) AS INT) AS lvl,
             (100 * CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT))
               @IDIV CAST(count(*) AS BIGINT) AS qty_avg_c,
             (CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT))
               @IDIV CAST(count(*) AS BIGINT) AS price_avg_c,
             CAST(count(*) AS BIGINT) AS n
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      WHERE o.o_orderpriority IN ('1-URGENT', '2-HIGH')
      GROUP BY ROLLUP(c.c_mktsegment, n.n_name)
      ORDER BY lvl, c_mktsegment NULLS FIRST, n_name NULLS FIRST"""

  private val texts: Map[String, (Seq[String], String)] = Map(
    "tpcds_q27_demo_rollup_avg" -> (Seq("lineitem", "orders", "customer", "nation") -> nq_q27_demo_rollup_avg),
    "tpcds_q22_rollup_avg_qty" -> (Seq("lineitem", "part") -> nq_q22_rollup_avg_qty),
    "tpcds_q11_yoy_preference" -> (Seq("lineitem", "orders", "customer") -> nq_q11_yoy_preference),
    "tpcds_q57_deviation_lag" -> (Seq("lineitem", "supplier") -> nq_q57_deviation_lag),
    "tpcds_q29_three_fact_qty" -> (Seq("lineitem", "orders", "part") -> nq_q29_three_fact_qty),
    "tpcds_q69_channel_anti_demo" -> (Seq("customer", "orders") -> nq_q69_channel_anti_demo),
    "tpcds_q77_pnl_rollup" -> (Seq("lineitem", "supplier") -> nq_q77_pnl_rollup),
    "tpcds_q3_brand_date_agg" -> (Seq("lineitem", "part") -> nq_q3_brand_date_agg),
    "tpcds_q7_demo_avg" -> (Seq("lineitem", "orders", "customer", "part") -> nq_q7_demo_avg),
    "tpcds_q13_or_banded_avg" -> (Seq("lineitem", "orders", "customer") -> nq_q13_or_banded_avg),
    "tpcds_q19_brand_geo_mismatch" -> (Seq("lineitem", "orders", "customer", "supplier", "part") -> nq_q19_brand_geo_mismatch),
    "tpcds_q24_netpaid_above_avg" -> (Seq("lineitem", "orders", "customer", "part") -> nq_q24_netpaid_above_avg),
    "tpcds_q28_banded_distinct" -> (Seq("lineitem") -> nq_q28_banded_distinct),
    "tpcds_q30_return_ratio_state" -> (Seq("lineitem", "orders", "customer") -> nq_q30_return_ratio_state),
    "tpcds_q45_zip_or_itemlist" -> (Seq("lineitem", "orders", "customer", "nation", "part") -> nq_q45_zip_or_itemlist),
    "tpcds_q46_ticket_buckets" -> (Seq("lineitem", "orders", "customer") -> nq_q46_ticket_buckets),
    "tpcds_q61_promo_ratio" -> (Seq("lineitem", "orders") -> nq_q61_promo_ratio),
    "tpcds_q65_best_seller" -> (Seq("lineitem", "supplier", "part") -> nq_q65_best_seller),
    "tpcds_q89_monthly_vs_class_avg" -> (Seq("lineitem", "part") -> nq_q89_monthly_vs_class_avg),
    "tpcds_q85_multi_dim_filter" -> (Seq("lineitem", "orders", "customer", "nation") -> nq_q85_multi_dim_filter),
    "tpcds_q8_nation_prefix_semi" -> (Seq("lineitem", "orders", "customer", "nation", "part") -> nq_q8_nation_prefix_semi),
    "tpcds_q92_excess_threshold" -> (Seq("lineitem", "part") -> q92),
    "tpcds_q6_category_avg" -> (Seq("customer", "orders", "lineitem", "part", "nation") -> q6),
    "tpcds_q98_revenue_share" -> (Seq("lineitem") -> q98),
    "tpcds_q15_or_disjunction" -> (Seq("orders") -> q15),
    "tpcds_q37_range_dim_semi" -> (Seq("part", "lineitem") -> q37),
    "tpcds_q38_triple_intersect" -> (Seq("lineitem", "orders") -> q38),
    "tpcds_q87_triple_except" -> (Seq("lineitem", "orders") -> q87),
    "tpcds_q90_time_band_ratio" -> (Seq("events") -> q90),
    "tpcds_q41_or_tree_exists" -> (Seq("part", "lineitem") -> q41),
    "tpcds_q94_ship_anti_semi" -> (Seq("orders", "lineitem") -> q94),
    "tpcds_q72_date_offset_join" -> (Seq("lineitem", "orders") -> q72),
    "tpcds_q9_case_ladder" -> (Seq("lineitem", "region") -> q9),
    "tpcds_q44_best_worst_rank" -> (Seq("lineitem") -> q44),
    "tpcds_q76_null_channel" -> (Seq("lineitem", "part") -> q76),
    "tpcds_q66_channel_month_pivot" -> (Seq("lineitem") -> q66),
    "tpcds_q75_yoy_decline" -> (Seq("lineitem", "part") -> q75),
    "tpcds_q93_returns_adjust" -> (Seq("lineitem", "orders") -> q93),
    "tpcds_q99_lag_buckets" -> (Seq("lineitem", "orders") -> q99),
    "tpcds_q21_before_after_ratio" -> (Seq("lineitem") -> q21),
    "tpcds_q54_revenue_histogram" -> (Seq("orders") -> q54),
    "tpcds_q2_dow_pivot_yoy" -> (Seq("lineitem") -> q2),
    "tpcds_q35_gated_stats" -> (Seq("customer", "orders", "lineitem") -> q35),
    "tpcds_q64_cross_period_self" -> (Seq("lineitem", "orders") -> q64),
    "tpcds_q58_channel_band" -> (Seq("lineitem") -> q58),
    "tpcds_q59_week_shift" -> (Seq("lineitem") -> q59),
    "tpcds_q97_channel_overlap_full" -> (Seq("lineitem", "orders") -> q97),
    "tpcds_q31_growth_ratio_chain" -> (Seq("lineitem", "orders", "customer") -> q31),
    "tpcds_q34_count_buckets" -> (Seq("lineitem", "orders", "customer") -> q34),
    "tpcds_q70_rollup_rank_partition" -> (Seq("lineitem", "part") -> q70),
    "tpcds_q47_window_family_dev" -> (Seq("lineitem") -> q47),
    "tpcds_q1_correlated_group_avg" -> (Seq("orders", "lineitem", "customer") -> q1),
    "tpcds_q17_three_fact_chain" -> (Seq("lineitem", "orders") -> q17),
    "tpcds_q49_dual_rank_union" -> (Seq("lineitem") -> q49),
    "tpcds_q14_cross_channel_intersect" -> (Seq("lineitem", "part") -> q14),
    "tpcds_q39_stdev_pairs" -> (Seq("lineitem") -> q39),
    "tpcds_q78_channel_ratio_anti" -> (Seq("lineitem") -> q78),
    "tpcds_q5_channel_rollup" -> (Seq("lineitem") -> q5),
    "tpcds_q95_with_chain_semi" -> (Seq("lineitem", "orders") -> q95),
    "tpcds_q51_window_over_agg" -> (Seq("lineitem") -> q51),
    "tpcds_q67_grouping_sets_topk" -> (Seq("lineitem", "part") -> q67),
    "tpcds_q10_exists_chain" -> (Seq("customer", "orders", "lineitem") -> q10),
    "tpcds_q23_multi_with_cross" -> (Seq("lineitem", "orders") -> q23),
    "tpcds_q71_channel_brand_month" -> (Seq("lineitem", "part") -> q71),
    "tpcds_q4_yoy_growth" -> (Seq("orders", "lineitem") -> q4),
    "tpcds_q88_multi_scan_counts" -> (Seq("lineitem") -> q88),
    "tpcds_q36_lochierarchy_rank" -> (Seq("lineitem", "part") -> q36),
    "tpcds_q33_agg_over_union_agg" -> (Seq("lineitem", "part") -> q33))

  override def queries: Map[String, (SparkSession, String) => DataFrame] =
    texts.map { case (name, (tables, text)) =>
      name -> ((s: SparkSession, dir: String) => sql(s, dir, tables, spark(text)))
    }

  override def oracle: Map[String, String] =
    texts.map { case (name, (_, text)) => name -> duck(text) }
}
