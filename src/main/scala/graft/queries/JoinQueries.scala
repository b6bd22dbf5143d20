package graft.queries

import graft.{QueryPack, Tables}
import graft.operators.AsOfJoin
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Join operators (SURVEY.md §2.3): inner/left/right/full equi joins
 * (shuffle-hash / sort-merge picked by Catalyst+AQE), broadcast join
 * (small-dim hint), semi/anti (EXISTS / NOT EXISTS), cross join,
 * non-equi theta join (broadcast nested loop), interval join (time-range
 * predicate, reference `StreamExecIntervalJoin`), temporal/as-of join
 * (reference `StreamExecTemporalJoin` → graft.operators.AsOfJoin), and
 * coGroup (reference `DataSet.coGroup` / `CoGroupedStreams`).
 *
 * Scale notes: dims (nation, region, customer-at-our-SF) are broadcast —
 * at 100 TB the fact⋈fact joins (lineitem⋈orders) shuffle on the join
 * key with AQE skew splitting; nothing here materializes a cartesian
 * blow-up except the explicitly-bounded cross/theta queries, which
 * aggregate before emitting.
 */
object JoinQueries extends QueryPack {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Fact ⋈ fact equi join (shuffle on key) + group agg.
    "join_inner" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val ord = Tables.load(s, dir, "orders")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_lines"),
             sum(floor(col("l_quantity") * 100)).as("sum_qty"))
        .orderBy(col("o_orderstatus"))
    }),

    // Left outer: some orders have no surviving customer after filter.
    "join_left_outer" -> ((s, dir) => {
      val ord = Tables.load(s, dir, "orders")
      val cust = Tables.load(s, dir, "customer").filter(col("c_acctbal") > 5000)
      ord.join(cust, col("o_custkey") === col("c_custkey"), "left")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
             count(col("c_custkey")).as("n_matched"))
        .orderBy(col("o_orderstatus"))
    }),

    // Right outer.
    "join_right_outer" -> ((s, dir) => {
      val ord = Tables.load(s, dir, "orders").filter(col("o_totalprice") > 200000)
      val cust = Tables.load(s, dir, "customer")
      ord.join(cust, col("o_custkey") === col("c_custkey"), "right")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n"),
             count(col("o_orderkey")).as("n_orders"))
        .orderBy(col("c_nationkey"))
    }),

    // Full outer with misses on both sides.
    "join_full_outer" -> ((s, dir) => {
      val liAgg = Tables.load(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(sum(floor(col("l_quantity") * 100)).as("qty"))
      val part = Tables.load(s, dir, "part").filter(col("p_size") > 25)
      liAgg.join(part, col("l_partkey") === col("p_partkey"), "full")
        .select(coalesce(col("l_partkey"), col("p_partkey")).as("partkey"),
                col("qty"), col("p_size"))
        .orderBy(col("partkey"))
    }),

    // Semi join = EXISTS.
    "join_semi" -> ((s, dir) => {
      val cust = Tables.load(s, dir, "customer")
      val big = Tables.load(s, dir, "orders").filter(col("o_totalprice") > 250000)
      cust.join(big, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // Anti join = NOT EXISTS.
    "join_anti" -> ((s, dir) => {
      val cust = Tables.load(s, dir, "customer")
      val ord = Tables.load(s, dir, "orders")
      cust.join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // Cross join (cartesian, both sides tiny).
    "join_cross" -> ((s, dir) => {
      val r = Tables.load(s, dir, "region")
      val n = Tables.load(s, dir, "nation")
      r.crossJoin(n)
        .select(col("r_name"), col("n_name"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // Non-equi theta join → broadcast nested loop; aggregated output.
    "join_theta_nonequi" -> ((s, dir) => {
      val supp = Tables.load(s, dir, "supplier")
      // The comparison volume is quadratic by construction (that IS
      // the theta-join gate) — but it must still DISTRIBUTE: the
      // streamed side of a broadcast NLJ inherits the scan's split
      // count, and a single compact parquet file is one split, so
      // without the explicit repartition the whole |S|×|P| loop runs
      // on ONE task (measured at sf10: 100k×2M comparisons pinned a
      // single core ~30 min). The fixed width keeps AQE from
      // size-coalescing the tiny shuffle back to one partition.
      val part = Tables.load(s, dir, "part").repartition(32)
      supp.join(part, col("s_acctbal") < col("p_retailprice"))
        .groupBy(col("s_suppkey"))
        .agg(count(lit(1)).as("n_cheaper"))
        .orderBy(col("s_suppkey"))
    }),

    // The SCALABLE twin of the theta gate (operators/BandJoin.scala):
    // the same per-supplier count of costlier parts, but via a
    // histogram + suffix-sum broadcast and an own-bucket equi-join —
    // O(|S| + |P| + |S||P|/B) instead of |S|×|P|. Hash-identical to
    // join_theta_nonequi's oracle; plan-pinned to contain NO
    // nested-loop join (PlanAuditSpec).
    "join_theta_banded" -> ((s, dir) => {
      val supp = Tables.load(s, dir, "supplier")
      val part = Tables.load(s, dir, "part")
      graft.operators.BandJoin.countGreater(
          supp, "s_suppkey", "s_acctbal", part, "p_retailprice", "n_cheaper")
        .filter(col("n_cheaper") > 0) // inner-join semantics of the twin
        .select(col("s_suppkey"), col("n_cheaper"))
        .orderBy(col("s_suppkey"))
    }),

    // Value-domain band join (operators/BandJoin.absBand): suppliers
    // paired with customers within 500 CENTS of account balance
    // through a bucket±1 equi-join, candidates output-proportional
    // instead of |S|×|C| — the value analog of the interval join's
    // time-bucket decomposition. The band lives on the floor-quantized
    // integer-cent grid: a raw-double band (|s−c| <= 5.0) evaluates
    // the boundary differently between `abs(s−c)` and DuckDB's
    // IEJoin-friendly `c BETWEEN s−5 AND s+5` spelling (float
    // cancellation vs endpoint rounding — caught by the sf0.1/sf10
    // sweeps), while integer cents compare exactly in both engines.
    "join_band_abs" -> ((s, dir) => {
      val supp = Tables.load(s, dir, "supplier")
        .withColumn("s_cents", floor(col("s_acctbal") * 100))
      val cust = Tables.load(s, dir, "customer")
        .withColumn("c_cents", floor(col("c_acctbal") * 100))
      graft.operators.BandJoin.absBand(supp, "s_cents", cust, "c_cents", 500.0)
        .groupBy(col("s_suppkey"))
        .agg(count(lit(1)).as("n_near"),
          sum(col("c_cents")).as("cents"))
        .orderBy(col("s_suppkey"))
    }),

    // Explicit broadcast-hint join on a small dim.
    "join_broadcast_dim" -> ((s, dir) => {
      val cust = Tables.load(s, dir, "customer")
      val nat = Tables.load(s, dir, "nation")
      cust.join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_cust"),
             sum(floor(col("c_acctbal") * 100)).as("sum_bal"))
        .orderBy(col("n_name"))
    }),

    // Interval join: purchases within 10 minutes after a click, same user.
    "join_interval" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("cu"), col("ts").as("click_ts"), col("event_id").as("click_id"))
      val buys = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("bu"), col("ts").as("buy_ts"), col("event_id").as("buy_id"))
      clicks.join(buys,
          col("cu") === col("bu") &&
          col("buy_ts") >= col("click_ts") &&
          col("buy_ts") <= col("click_ts") + expr("INTERVAL 10 MINUTES"))
        .select(col("click_id"), col("buy_id"), col("cu").as("user_id"))
        .orderBy(col("click_id"), col("buy_id"))
    }),

    // Interval LEFT OUTER join (batch): clicks keep a row even when no
    // purchase lands in their 10-minute window (reference interval
    // outer join null-extension semantics, batch form).
    "join_interval_outer" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("cu"), col("ts").as("click_ts"), col("event_id").as("click_id"))
      val buys = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("bu"), col("ts").as("buy_ts"), col("event_id").as("buy_id"))
      clicks.join(buys,
          col("cu") === col("bu") &&
          col("buy_ts") >= col("click_ts") &&
          col("buy_ts") <= col("click_ts") + expr("INTERVAL 10 MINUTES"), "left")
        .select(col("click_id"), col("buy_id"), col("cu").as("user_id"))
        .orderBy(col("click_id"), col("buy_id"))
    }),

    // Temporal / as-of join: each event enriched with the customer's most
    // recent order at the event's time (union+window, no pair explosion).
    "join_asof" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("ts"))
      val ord = Tables.load(s, dir, "orders")
      AsOfJoin(ev, ord,
          leftKey = "user_id", rightKey = "o_custkey",
          leftTime = "ts", rightTime = "o_orderdate",
          rightCols = Seq("o_orderkey", "o_totalprice"),
          rightTieBreak = "o_orderkey")
        .orderBy(col("event_id"))
    }),

    // BATCH `FOR SYSTEM_TIME AS OF` SQL surface: the same desugar +
    // rule as the streaming gate, planned into the as-of window
    // formulation (union + ordered window — linear, never the
    // |left|x|right| pre-rank explosion). Must equal join_asof.
    "join_asof_sql" -> ((s, dir) => {
      val evView = graft.streaming.StreamOps.freshName("asof_events")
      val ordView = graft.streaming.StreamOps.freshName("asof_orders")
      Tables.load(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("ts"))
        .createOrReplaceTempView(evView)
      Tables.load(s, dir, "orders").createOrReplaceTempView(ordView)
      graft.sqlx.TemporalSql.registerVersioned(ordView, "o_orderdate", "o_orderkey")
      graft.sqlx.TemporalSql.sql(s, s"""
        SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS ts,
               d.o_orderkey, d.o_totalprice
        FROM $evView p
        LEFT JOIN $ordView FOR SYSTEM_TIME AS OF p.ts AS d
          ON p.user_id = d.o_custkey""")
        .orderBy(col("event_id"))
    }),

    // Temporal TABLE FUNCTION SQL (reference TemporalTableFunction /
    // `LATERAL TABLE (rates(o.rowtime))`): the function-shaped spelling
    // of the versioned as-of join. The front-end lifts the WHERE key
    // equality into an ON clause and lowers onto the same
    // FOR SYSTEM_TIME AS OF pipeline — inner semantics (comma-join):
    // probes with no version at their time drop out.
    "join_temporal_fn_sql" -> ((s, dir) => {
      val evView = graft.streaming.StreamOps.freshName("ttf_events")
      val ordView = graft.streaming.StreamOps.freshName("ttf_orders")
      Tables.load(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("ts"))
        .createOrReplaceTempView(evView)
      Tables.load(s, dir, "orders").createOrReplaceTempView(ordView)
      graft.sqlx.TemporalFnSql.registerTemporalFunction(
        "order_history", ordView, "o_orderdate", "o_orderkey", "o_custkey")
      new graft.api.TableEnv(s).sqlQuery(s"""
        SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS ts,
               r.o_orderkey, r.o_totalprice
        FROM $evView p, LATERAL TABLE (order_history(p.ts)) AS r
        WHERE p.user_id = r.o_custkey
        ORDER BY p.event_id""")
    }),

    // PROC-TIME `FOR SYSTEM_TIME AS OF PROCTIME()` SQL (reference
    // TemporalProcessTimeJoinOperator): every probe joins the dim's
    // CURRENT version — the latest (o_orderdate, o_orderkey) row per
    // customer — regardless of the probe's own time. Desugars to a
    // latest-version anti-join derived table; needs the dim's PRIMARY
    // KEY from the keyed registration.
    "join_temporal_proctime_sql" -> ((s, dir) => {
      val evView = graft.streaming.StreamOps.freshName("ptj_events")
      val ordView = graft.streaming.StreamOps.freshName("ptj_orders")
      Tables.load(s, dir, "events")
        .select(col("event_id"), col("user_id"))
        .createOrReplaceTempView(evView)
      Tables.load(s, dir, "orders").createOrReplaceTempView(ordView)
      graft.sqlx.TemporalSql.registerVersioned(
        ordView, "o_orderdate", "o_orderkey", "o_custkey")
      graft.sqlx.TemporalSql.sql(s, s"""
        SELECT p.event_id, p.user_id, d.o_orderkey,
               CAST(floor(d.o_totalprice * 100) AS BIGINT) AS cents
        FROM $evView p
        LEFT JOIN $ordView FOR SYSTEM_TIME AS OF PROCTIME() AS d
          ON p.user_id = d.o_custkey""")
        .orderBy(col("event_id"))
    }),

    // Salted skew join: the hot-key widening technique — probe rows
    // hashed across 8 salts, build side replicated per salt, join on
    // (key, salt). Must equal the plain join exactly (the salt only
    // changes partitioning), which the unsalted oracle proves.
    "join_salted_skew" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      val ord = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"))
      graft.operators.SkewJoin.saltedEquiJoin(li, ord, "l_orderkey", "o_orderkey", salts = 8)
        .select(col("l_orderkey"), col("l_linenumber"), col("o_orderpriority"),
          floor(col("l_quantity")).cast("bigint").as("qty"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // coGroup: per-key two-input grouped reduce (superset of join).
    "join_cogroup" -> ((s, dir) => {
      import s.implicits._
      val cust = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_name")).as[(Long, String)]
      val ord = Tables.load(s, dir, "orders")
        .select(col("o_custkey"), col("o_totalprice")).as[(Long, Double)]
      cust.groupByKey(_._1).cogroup(ord.groupByKey(_._1)) { (k, cs, os) =>
        val names = cs.map(_._2).toList
        if (names.isEmpty) Iterator.empty
        else {
          // floor-quantized integer cents: order-independent AND
          // tie-free — a HALF_UP/HALF_EVEN cent rounding divergence
          // vs the oracle surfaced at sf10 (scale-up epsilons land
          // prices exactly on .xx5 boundaries); floor has no ties
          val prices = os.map(_._2).toList
          val cents = prices.map(p => math.floor(p * 100).toLong).sum
          Iterator((k, names.head, prices.size.toLong, cents))
        }
      }.toDF("c_custkey", "c_name", "n_orders", "spend_cents")
        .orderBy(col("c_custkey"))
    })
  )

  override def oracle: Map[String, String] = Map(
    "join_inner" -> """
      SELECT o_orderstatus, count(*) AS n_lines,
             CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "join_left_outer" -> """
      SELECT o_orderstatus, count(*) AS n, count(c_custkey) AS n_matched
      FROM orders LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 5000) c
        ON o_custkey = c_custkey
      GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "join_right_outer" -> """
      SELECT c_nationkey, count(*) AS n, count(o_orderkey) AS n_orders
      FROM (SELECT * FROM orders WHERE o_totalprice > 200000) o
      RIGHT JOIN customer ON o_custkey = c_custkey
      GROUP BY c_nationkey ORDER BY c_nationkey""",
    "join_full_outer" -> """
      SELECT coalesce(l_partkey, p_partkey) AS partkey, qty, p_size
      FROM (SELECT l_partkey, CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty
            FROM lineitem GROUP BY l_partkey) li
      FULL JOIN (SELECT * FROM part WHERE p_size > 25) p
        ON l_partkey = p_partkey
      ORDER BY partkey""",
    "join_semi" -> """
      SELECT c_custkey, c_name FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_totalprice > 250000)
      ORDER BY c_custkey""",
    "join_anti" -> """
      SELECT c_custkey, c_name FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY c_custkey""",
    "join_cross" -> """
      SELECT r_name, n_name FROM region CROSS JOIN nation
      ORDER BY r_name, n_name""",
    "join_salted_skew" -> """
      SELECT l_orderkey, l_linenumber, o_orderpriority,
             CAST(floor(l_quantity) AS BIGINT) AS qty
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      ORDER BY l_orderkey, l_linenumber""",
    "join_theta_nonequi" -> """
      SELECT s_suppkey, count(*) AS n_cheaper
      FROM supplier JOIN part ON s_acctbal < p_retailprice
      GROUP BY s_suppkey ORDER BY s_suppkey""",
    "join_theta_banded" -> """
      SELECT s_suppkey, count(*) AS n_cheaper
      FROM supplier JOIN part ON s_acctbal < p_retailprice
      GROUP BY s_suppkey ORDER BY s_suppkey""",
    "join_band_abs" -> """
      SELECT s_suppkey, count(*) AS n_near,
             CAST(sum(c_cents) AS BIGINT) AS cents
      FROM (SELECT s_suppkey, CAST(floor(s_acctbal * 100) AS BIGINT) AS s_cents
            FROM supplier) s
      JOIN (SELECT CAST(floor(c_acctbal * 100) AS BIGINT) AS c_cents
            FROM customer) c
        ON c_cents BETWEEN s_cents - 500 AND s_cents + 500
      GROUP BY s_suppkey ORDER BY s_suppkey""",
    "join_broadcast_dim" -> """
      SELECT n_name, count(*) AS n_cust,
             CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS sum_bal
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name ORDER BY n_name""",
    "join_interval" -> """
      SELECT c.event_id AS click_id, b.event_id AS buy_id, c.user_id
      FROM (SELECT * FROM events WHERE event_type = 'click') c
      JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
        ON c.user_id = b.user_id
       AND b.ts >= c.ts AND b.ts <= c.ts + INTERVAL 10 MINUTE
      ORDER BY click_id, buy_id""",
    "join_interval_outer" -> """
      SELECT c.event_id AS click_id, b.event_id AS buy_id, c.user_id
      FROM (SELECT * FROM events WHERE event_type = 'click') c
      LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
        ON c.user_id = b.user_id
       AND b.ts >= c.ts AND b.ts <= c.ts + INTERVAL 10 MINUTE
      ORDER BY click_id, buy_id""",
    "join_asof" -> """
      SELECT event_id, user_id, ts, o_orderkey, o_totalprice
      FROM (
        SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts,
               o.o_orderkey, o.o_totalprice,
               row_number() OVER (PARTITION BY e.event_id
                 ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        FROM events e
        LEFT JOIN orders o
          ON e.user_id = o.o_custkey AND o.o_orderdate <= CAST(e.ts AS TIMESTAMP)
      ) t WHERE rn = 1
      ORDER BY event_id""",
    "join_asof_sql" -> """
      SELECT event_id, user_id, ts, o_orderkey, o_totalprice
      FROM (
        SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts,
               o.o_orderkey, o.o_totalprice,
               row_number() OVER (PARTITION BY e.event_id
                 ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        FROM events e
        LEFT JOIN orders o
          ON e.user_id = o.o_custkey AND o.o_orderdate <= CAST(e.ts AS TIMESTAMP)
      ) t WHERE rn = 1
      ORDER BY event_id""",
    "join_temporal_fn_sql" -> """
      SELECT event_id, user_id, ts, o_orderkey, o_totalprice
      FROM (
        SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts,
               o.o_orderkey, o.o_totalprice,
               row_number() OVER (PARTITION BY e.event_id
                 ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        FROM events e
        JOIN orders o
          ON e.user_id = o.o_custkey AND o.o_orderdate <= CAST(e.ts AS TIMESTAMP)
      ) t WHERE rn = 1
      ORDER BY event_id""",
    "join_temporal_proctime_sql" -> """
      SELECT e.event_id, e.user_id, d.o_orderkey, d.cents
      FROM events e
      LEFT JOIN (
        SELECT o_custkey, o_orderkey,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
          FROM orders) t
        WHERE rn = 1) d
        ON e.user_id = d.o_custkey
      ORDER BY e.event_id""",
    "join_cogroup" -> """
      SELECT c_custkey, c_name, count(o_orderkey) AS n_orders,
             CAST(coalesce(sum(CAST(floor(o_totalprice * 100) AS BIGINT)), 0)
                  AS BIGINT) AS spend_cents
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey, c_name ORDER BY c_custkey"""
  )
}
