package graft.queries

import graft.{QueryPack, Tables}
import graft.operators.CumulateWindow
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Time-window aggregations (SURVEY.md §2.4 group/TVF window aggs):
 * TUMBLE, HOP (sliding), SESSION (gap-based, per key), and CUMULATE
 * (expanding slices — reference `StreamExecWindowTableFunction` /
 * `SliceAssigners`; no Spark built-in → graft.operators.CumulateWindow).
 *
 * These run here in batch mode over the events table; the same window
 * expressions also run under Structured Streaming with `.withWatermark`
 * — see graft.streaming.StreamOps and the StreamQueries pack, which
 * executes them through a real streaming query against the same gate.
 *
 * Scale notes: window assignment is a map-side expression; each query is
 * one partial/final hash-agg shuffle keyed on (window, key). HOP and
 * CUMULATE fan out rows by the constant windows-per-event factor before
 * the partial agg, so shuffled bytes stay proportional to the number of
 * distinct (window, key) groups, not raw events.
 */
object TimeWindowQueries extends QueryPack {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TUMBLE 15min: count + value sum per window × event_type.
    "win_tumble" -> ((s, dir) => {
      Tables.load(s, dir, "events")
        .groupBy(window(col("ts"), "15 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
             sum(floor(col("value") * 100)).as("sum_value"))
        .select(col("w.start").as("ws"), col("w.end").as("we"),
                col("event_type"), col("n"), col("sum_value"))
        .orderBy(col("ws"), col("event_type"))
    }),

    // TUMBLE with a window OFFSET (reference TUMBLE(..., INTERVAL
    // offset) / TumblingEventTimeWindows.of(size, offset)): 15-minute
    // windows aligned 5 minutes off the epoch grid.
    "win_tumble_offset" -> ((s, dir) => {
      Tables.load(s, dir, "events")
        .groupBy(window(col("ts"), "15 minutes", "15 minutes", "5 minutes").as("w"))
        .agg(count(lit(1)).as("n"),
             sum(floor(col("value") * 100)).as("sum_value"))
        .select(col("w.start").as("ws"), col("n"), col("sum_value"))
        .orderBy(col("ws"))
    }),

    // HOP size 30min slide 10min: every event lands in 3 windows.
    "win_hop" -> ((s, dir) => {
      Tables.load(s, dir, "events")
        .groupBy(window(col("ts"), "30 minutes", "10 minutes").as("w"))
        .agg(count(lit(1)).as("n"),
             countDistinct(col("user_id")).as("n_users"))
        .select(col("w.start").as("ws"), col("w.end").as("we"),
                col("n"), col("n_users"))
        .orderBy(col("ws"))
    }),

    // SLICED hop (reference slice-shared window aggregation,
    // SliceAssigners.hopping): same 30min/10min hop as win_hop, but
    // each row is assigned ONCE to its 10-minute slice and the 3×
    // window fanout explodes the per-slice aggregate frame instead of
    // the input — at a 1h/5min hop that is 12× less shuffle volume.
    // PlanAuditSpec pins the Generate above the first aggregate.
    "win_hop_sliced" -> ((s, dir) => {
      graft.operators.SliceHop.hopSliced(
          Tables.load(s, dir, "events"), "ts",
          sizeUs = 30L * 60 * 1000000, slideUs = 10L * 60 * 1000000,
          keys = Nil,
          partials = Seq(count(lit(1)).as("__pn"),
            sum(floor(col("value") * 100).cast("long")).as("__ps")),
          merges = Seq(sum(col("__pn")).cast("bigint").as("n"),
            sum(col("__ps")).cast("bigint").as("sum_value")))
        .select(col("ws"), col("we"), col("n"), col("sum_value"))
        .orderBy(col("ws"))
    }),

    // SESSION with 30min gap per user; end = last event + gap.
    "win_session" -> ((s, dir) => {
      Tables.load(s, dir, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n"),
             sum(floor(col("value") * 100)).as("sum_value"))
        .select(col("user_id"), col("w.start").as("ws"), col("w.end").as("we"),
                col("n"), col("sum_value"))
        .orderBy(col("user_id"), col("ws"))
    }),

    // SESSION with a DYNAMIC per-row gap (reference
    // DynamicEventTimeSessionWindows / SURVEY §7.5 risk item): clicks
    // extend their session by 10 minutes, everything else by 30 —
    // Spark's gap-expression form of session_window.
    "win_session_dynamic" -> ((s, dir) => {
      // session_window's gap expression requires CalendarIntervalType —
      // make_interval builds one (ANSI INTERVAL literals are day-time
      // typed and rejected)
      val gap = when(col("event_type") === "click", expr("make_interval(0,0,0,0,0,10,0)"))
        .otherwise(expr("make_interval(0,0,0,0,0,30,0)"))
      Tables.load(s, dir, "events")
        .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
        .agg(count(lit(1)).as("n"),
             sum(floor(col("value") * 100)).as("sum_value"))
        .select(col("user_id"), col("w.start").as("ws"), col("w.end").as("we"),
                col("n"), col("sum_value"))
        .orderBy(col("user_id"), col("ws"))
    }),

    // Window join (reference StreamExecWindowJoin): clicks ⋈ purchases
    // inside the same 30-min tumbling window, same user — an equi-join
    // on the window column (shuffle on (window, key), no time-range
    // state like the interval join).
    "win_window_join" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(window(col("ts"), "30 minutes").as("w"), col("user_id"),
          col("event_id").as("click_id"))
      val buys = ev.filter(col("event_type") === "purchase")
        .select(window(col("ts"), "30 minutes").as("w"), col("user_id"),
          col("event_id").as("buy_id"))
      clicks.join(buys, Seq("w", "user_id"))
        .select(col("w.start").as("ws"), col("user_id"), col("click_id"), col("buy_id"))
        .orderBy(col("click_id"), col("buy_id"))
    }),

    // Window join — FULL OUTER (reference StreamExecWindowJoin
    // supports INNER/LEFT/RIGHT/FULL/SEMI/ANTI): same equi-join on
    // (window, key), null-extending panes with activity on one side
    // only. The USING-join coalesces the window/key columns.
    "win_window_join_outer" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(window(col("ts"), "30 minutes").as("w"), col("user_id"),
          col("event_id").as("click_id"))
      val buys = ev.filter(col("event_type") === "purchase")
        .select(window(col("ts"), "30 minutes").as("w"), col("user_id"),
          col("event_id").as("buy_id"))
      clicks.join(buys, Seq("w", "user_id"), "full_outer")
        .select(col("w.start").as("ws"), col("user_id"),
          col("click_id"), col("buy_id"))
        .orderBy(col("ws"), col("user_id"), col("click_id"), col("buy_id"))
    }),

    // Window join — SEMI: clicks whose (window, user) pane saw at
    // least one purchase (existence only, no fan-out).
    "win_window_join_semi" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(window(col("ts"), "30 minutes").as("w"), col("user_id"),
          col("event_id").as("click_id"))
      val buys = ev.filter(col("event_type") === "purchase")
        .select(window(col("ts"), "30 minutes").as("w"), col("user_id"))
      clicks.join(buys, Seq("w", "user_id"), "left_semi")
        .select(col("w.start").as("ws"), col("user_id"), col("click_id"))
        .orderBy(col("click_id"))
    }),

    // Window join — ANTI: clicks whose pane saw NO purchase.
    "win_window_join_anti" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(window(col("ts"), "30 minutes").as("w"), col("user_id"),
          col("event_id").as("click_id"))
      val buys = ev.filter(col("event_type") === "purchase")
        .select(window(col("ts"), "30 minutes").as("w"), col("user_id"))
      clicks.join(buys, Seq("w", "user_id"), "left_anti")
        .select(col("w.start").as("ws"), col("user_id"), col("click_id"))
        .orderBy(col("click_id"))
    }),

    // Window rank TVF (reference StreamExecWindowRank): top-2 events by
    // value inside each (1-hour window, event_type) pane.
    "win_window_rank" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("ws"), col("event_type"))
        .orderBy(col("value").desc, col("event_id"))
      Tables.load(s, dir, "events")
        .select(window(col("ts"), "1 hour").getField("start").as("ws"),
          col("event_type"), col("event_id"), col("value"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
        .orderBy(col("ws"), col("event_type"), col("rn"))
    }),

    // Window join in TVF SQL text (reference StreamExecWindowJoin SQL
    // form: two windowed tables joined on window_start/window_end +
    // key). Hash-identical to win_window_join — the desugared plan is
    // the same equi-join on (window, user) because window_end is
    // functionally determined by window_start for a fixed TUMBLE size.
    "win_window_join_tvf_sql" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      ev.filter(col("event_type") === "click").createOrReplaceTempView("clicks")
      ev.filter(col("event_type") === "purchase").createOrReplaceTempView("buys")
      graft.sqlx.WindowTvfSql.sql(s, """
        SELECT c.window_start AS ws, c.user_id, c.event_id AS click_id,
               b.event_id AS buy_id
        FROM TABLE(TUMBLE(TABLE clicks, DESCRIPTOR(ts), INTERVAL '30' MINUTE)) c
        JOIN TABLE(TUMBLE(TABLE buys, DESCRIPTOR(ts), INTERVAL '30' MINUTE)) b
          ON c.window_start = b.window_start AND c.window_end = b.window_end
         AND c.user_id = b.user_id
        ORDER BY click_id, buy_id""")
    }),

    // Window rank in TVF SQL text (reference StreamExecWindowRank SQL
    // form: ROW_NUMBER over (window_start, key) with a rank filter).
    // Hash-identical to win_window_rank.
    "win_window_rank_tvf_sql" -> ((s, dir) => {
      Tables.load(s, dir, "events").createOrReplaceTempView("events")
      graft.sqlx.WindowTvfSql.sql(s, """
        SELECT ws, event_type, event_id, value, rn FROM (
          SELECT window_start AS ws, event_type, event_id, value,
                 ROW_NUMBER() OVER (PARTITION BY window_start, event_type
                                    ORDER BY value DESC, event_id) AS rn
          FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '1' HOUR))) t
        WHERE rn <= 2
        ORDER BY ws, event_type, rn""")
    }),

    // Window deduplication in TVF SQL text (reference
    // StreamExecWindowDeduplicate: ROW_NUMBER ordered by the time
    // attribute, rank = 1 — keep the FIRST event per window × user).
    // Same WindowGroupLimit shape as streaming dedup, scoped per pane.
    "win_window_dedup_tvf_sql" -> ((s, dir) => {
      Tables.load(s, dir, "events").createOrReplaceTempView("events")
      graft.sqlx.WindowTvfSql.sql(s, """
        SELECT ws, user_id, event_id, event_type FROM (
          SELECT window_start AS ws, user_id, event_id, event_type,
                 ROW_NUMBER() OVER (PARTITION BY window_start, user_id
                                    ORDER BY ts, event_id) AS rn
          FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '30' MINUTE))) t
        WHERE rn = 1
        ORDER BY ws, user_id""")
    }),

    // SQL-TEXT window TVFs (reference FlinkSqlOperatorTable TUMBLE/HOP/
    // CUMULATE): the same aggregations as win_tumble/win_hop/
    // win_cumulate, but driven by TVF query text through
    // sqlx.WindowTvfSql.desugar — a user can paste reference SQL.
    // TUMBLE uses the NAMED-argument form, HOP the named form with the
    // arguments deliberately out of order, CUMULATE a positional
    // constant-expression duration — all three alternate syntaxes the
    // reference grammar accepts (SqlWindowTableFunction named params),
    // each hash-identical to its DataFrame twin.
    "win_tumble_tvf_sql" -> ((s, dir) => {
      Tables.load(s, dir, "events").createOrReplaceTempView("events")
      graft.sqlx.WindowTvfSql.sql(s, """
        SELECT window_start AS ws, window_end AS we, event_type,
               count(*) AS n, sum(floor(value * 100)) AS sum_value
        FROM TABLE(TUMBLE(DATA => TABLE events, TIMECOL => DESCRIPTOR(ts),
                          SIZE => INTERVAL '15' MINUTE))
        GROUP BY window_start, window_end, event_type
        ORDER BY ws, event_type""")
    }),

    "win_hop_tvf_sql" -> ((s, dir) => {
      Tables.load(s, dir, "events").createOrReplaceTempView("events")
      graft.sqlx.WindowTvfSql.sql(s, """
        SELECT window_start AS ws, window_end AS we,
               count(*) AS n, count(DISTINCT user_id) AS n_users
        FROM TABLE(HOP(SIZE => INTERVAL '30' MINUTE, DATA => TABLE events,
                       SLIDE => INTERVAL '10' MINUTE, TIMECOL => DESCRIPTOR(ts)))
        GROUP BY window_start, window_end
        ORDER BY ws""")
    }),

    // expression-interval variants (reference grammar accepts any
    // constant interval expression, not just INTERVAL literals): the
    // named TUMBLE size is interval ARITHMETIC, the positional HOP
    // durations mix make_interval(…) with a literal — both evaluate
    // through the session and stay hash-identical to the literal twins
    "win_tumble_tvf_expr_sql" -> ((s, dir) => {
      Tables.load(s, dir, "events").createOrReplaceTempView("events")
      graft.sqlx.WindowTvfSql.sql(s, """
        SELECT window_start AS ws, window_end AS we, event_type,
               count(*) AS n, sum(floor(value * 100)) AS sum_value
        FROM TABLE(TUMBLE(DATA => TABLE events, TIMECOL => DESCRIPTOR(ts),
                          SIZE => INTERVAL '10' MINUTE + INTERVAL '300' SECOND))
        GROUP BY window_start, window_end, event_type
        ORDER BY ws, event_type""")
    }),

    "win_hop_tvf_expr_sql" -> ((s, dir) => {
      Tables.load(s, dir, "events").createOrReplaceTempView("events")
      graft.sqlx.WindowTvfSql.sql(s, """
        SELECT window_start AS ws, window_end AS we,
               count(*) AS n, count(DISTINCT user_id) AS n_users
        FROM TABLE(HOP(TABLE events, DESCRIPTOR(ts),
                       make_interval(0, 0, 0, 0, 0, 10, 0),
                       INTERVAL '15' MINUTE * 2))
        GROUP BY window_start, window_end
        ORDER BY ws""")
    }),

    "win_cumulate_tvf_sql" -> ((s, dir) => {
      Tables.load(s, dir, "events").createOrReplaceTempView("events")
      graft.sqlx.WindowTvfSql.sql(s, """
        SELECT window_start AS ws, window_end AS we,
               count(*) AS n, sum(floor(value * 100)) AS sum_value
        FROM TABLE(CUMULATE(TABLE events, DESCRIPTOR(ts), INTERVAL '20' MINUTE,
                            INTERVAL '30' MINUTE + INTERVAL '30' MINUTE))
        GROUP BY window_start, window_end
        ORDER BY ws, we""")
    }),

    // LEGACY group-window SQL (reference TUMBLE_OLD/HOP_OLD/SESSION_OLD
    // + *_START/*_END auxiliaries — the pre-TVF syntax its docs and
    // tests still lead with): the same aggregations as win_tumble/
    // win_hop/win_session, driven by `GROUP BY TUMBLE(ts, INTERVAL …)`
    // text through the unified SQL door (sqlx.GroupWindowSql). Shared
    // oracle constants enforce hash-identity with the API twins.
    "win_tumble_legacy_sql" -> ((s, dir) => {
      Tables.load(s, dir, "events").createOrReplaceTempView("events")
      new graft.api.TableEnv(s).sqlQuery("""
        SELECT TUMBLE_START(ts, INTERVAL '15' MINUTE) AS ws,
               TUMBLE_END(ts, INTERVAL '15' MINUTE) AS we,
               event_type, count(*) AS n, sum(floor(value * 100)) AS sum_value
        FROM events
        GROUP BY TUMBLE(ts, INTERVAL '15' MINUTE), event_type
        ORDER BY ws, event_type""")
    }),

    "win_hop_legacy_sql" -> ((s, dir) => {
      Tables.load(s, dir, "events").createOrReplaceTempView("events")
      new graft.api.TableEnv(s).sqlQuery("""
        SELECT HOP_START(ts, INTERVAL '10' MINUTE, INTERVAL '30' MINUTE) AS ws,
               HOP_END(ts, INTERVAL '10' MINUTE, INTERVAL '30' MINUTE) AS we,
               count(*) AS n, count(DISTINCT user_id) AS n_users
        FROM events
        GROUP BY HOP(ts, INTERVAL '10' MINUTE, INTERVAL '30' MINUTE)
        ORDER BY ws""")
    }),

    "win_session_legacy_sql" -> ((s, dir) => {
      Tables.load(s, dir, "events").createOrReplaceTempView("events")
      new graft.api.TableEnv(s).sqlQuery("""
        SELECT user_id, SESSION_START(ts, INTERVAL '30' MINUTE) AS ws,
               SESSION_END(ts, INTERVAL '30' MINUTE) AS we,
               count(*) AS n, sum(floor(value * 100)) AS sum_value
        FROM events
        GROUP BY user_id, SESSION(ts, INTERVAL '30' MINUTE)
        ORDER BY user_id, ws""")
    }),

    // CUMULATE size 1h step 20min: expanding windows per hour.
    "win_cumulate" -> ((s, dir) => {
      CumulateWindow(Tables.load(s, dir, "events"), "ts", stepMinutes = 20, sizeMinutes = 60)
        .groupBy(col("w_start"), col("w_end"))
        .agg(count(lit(1)).as("n"),
             sum(floor(col("value") * 100)).as("sum_value"))
        .select(col("w_start").as("ws"), col("w_end").as("we"),
                col("n"), col("sum_value"))
        .orderBy(col("ws"), col("we"))
    })
  )

  // oracle texts shared by a DataFrame-API gate and its TVF-SQL twin —
  // ONE constant per window shape, so the hash-identical invariant is
  // enforced by construction rather than copy-paste discipline
  private[queries] val sessionOracleSql = """
      WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                      OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM events),
      sessions AS (
        SELECT user_id, ts, value,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM flagged)
      SELECT user_id, min(ts) AS ws, max(ts) + INTERVAL 30 MINUTE AS we,
             count(*) AS n,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_value
      FROM sessions GROUP BY user_id, sid ORDER BY user_id, ws"""

  private[queries] val tumbleOracleSql = """
      SELECT time_bucket(INTERVAL 15 MINUTE, ts) AS ws,
             time_bucket(INTERVAL 15 MINUTE, ts) + INTERVAL 15 MINUTE AS we,
             event_type, count(*) AS n,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_value
      FROM events
      GROUP BY 1, 2, 3 ORDER BY ws, event_type"""
  private[queries] val hopOracleSql = """
      SELECT ws, ws + INTERVAL 30 MINUTE AS we, count(*) AS n,
             count(DISTINCT user_id) AS n_users
      FROM (
        SELECT time_bucket(INTERVAL 10 MINUTE, ts) - k * INTERVAL 10 MINUTE AS ws,
               user_id
        FROM events, generate_series(0, 2) AS t(k))
      GROUP BY ws ORDER BY ws"""
  private[queries] val cumulateOracleSql = """
      SELECT ws, we, count(*) AS n,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_value
      FROM (
        SELECT time_bucket(INTERVAL 60 MINUTE, ts) AS ws,
               time_bucket(INTERVAL 60 MINUTE, ts) + k * INTERVAL 20 MINUTE AS we,
               ts, value
        FROM events, generate_series(1, 3) AS t(k))
      WHERE we > ts
      GROUP BY ws, we ORDER BY ws, we"""

  private[queries] val windowJoinOracleSql = """
      SELECT c.ws, c.user_id, c.click_id, b.buy_id
      FROM (SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS ws, user_id,
                   event_id AS click_id
            FROM events WHERE event_type = 'click') c
      JOIN (SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS ws, user_id,
                   event_id AS buy_id
            FROM events WHERE event_type = 'purchase') b
        ON c.ws = b.ws AND c.user_id = b.user_id
      ORDER BY click_id, buy_id"""
  private[queries] val windowRankOracleSql = """
      SELECT ws, event_type, event_id, value, rn FROM (
        SELECT time_bucket(INTERVAL 1 HOUR, ts) AS ws, event_type,
               event_id, value,
               row_number() OVER (PARTITION BY time_bucket(INTERVAL 1 HOUR, ts), event_type
                                  ORDER BY value DESC, event_id) AS rn
        FROM events) t
      WHERE rn <= 2 ORDER BY ws, event_type, rn"""

  private[queries] val windowDedupOracleSql = """
      SELECT ws, user_id, event_id, event_type FROM (
        SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS ws, user_id,
               event_id, event_type,
               row_number() OVER (PARTITION BY time_bucket(INTERVAL 30 MINUTE, ts), user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events) t
      WHERE rn = 1 ORDER BY ws, user_id"""

  override def oracle: Map[String, String] = Map(
    "win_tumble" -> tumbleOracleSql,
    "win_tumble_offset" -> """
      SELECT time_bucket(INTERVAL 15 MINUTE, ts,
                         TIMESTAMP '2000-01-01 00:05:00') AS ws,
             count(*) AS n,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_value
      FROM events
      GROUP BY 1 ORDER BY ws""",
    "win_hop" -> hopOracleSql,
    "win_hop_sliced" -> """
      SELECT ws, ws + INTERVAL 30 MINUTE AS we, count(*) AS n,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_value
      FROM (
        SELECT time_bucket(INTERVAL 10 MINUTE, ts) - k * INTERVAL 10 MINUTE AS ws,
               value
        FROM events, generate_series(0, 2) AS t(k))
      GROUP BY ws ORDER BY ws""",
    "win_session" -> sessionOracleSql,
    "win_session_dynamic" -> """
      WITH g AS (
        SELECT user_id, ts, value,
               CASE WHEN event_type = 'click' THEN INTERVAL 10 MINUTE
                    ELSE INTERVAL 30 MINUTE END AS gap
        FROM events),
      flagged AS (
        SELECT user_id, ts, value, gap,
               CASE WHEN max(ts + gap) OVER (PARTITION BY user_id ORDER BY ts
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                      OR ts >= max(ts + gap) OVER (PARTITION BY user_id ORDER BY ts
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    THEN 1 ELSE 0 END AS new_session
        FROM g),
      sessions AS (
        SELECT user_id, ts, value, gap,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM flagged)
      SELECT user_id, min(ts) AS ws, max(ts + gap) AS we, count(*) AS n,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_value
      FROM sessions GROUP BY user_id, sid ORDER BY user_id, ws""",
    "win_window_join" -> windowJoinOracleSql,
    "win_window_join_outer" -> """
      SELECT COALESCE(c.ws, b.ws) AS ws, COALESCE(c.user_id, b.user_id) AS user_id,
             c.click_id, b.buy_id
      FROM (SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS ws, user_id,
                   event_id AS click_id
            FROM events WHERE event_type = 'click') c
      FULL OUTER JOIN (SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS ws, user_id,
                   event_id AS buy_id
            FROM events WHERE event_type = 'purchase') b
        ON c.ws = b.ws AND c.user_id = b.user_id
      ORDER BY ws, user_id, click_id, buy_id""",
    "win_window_join_semi" -> """
      SELECT c.ws, c.user_id, c.click_id
      FROM (SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS ws, user_id,
                   event_id AS click_id
            FROM events WHERE event_type = 'click') c
      WHERE EXISTS (SELECT 1 FROM events b
                    WHERE b.event_type = 'purchase' AND b.user_id = c.user_id
                      AND time_bucket(INTERVAL 30 MINUTE, b.ts) = c.ws)
      ORDER BY click_id""",
    "win_window_join_anti" -> """
      SELECT c.ws, c.user_id, c.click_id
      FROM (SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS ws, user_id,
                   event_id AS click_id
            FROM events WHERE event_type = 'click') c
      WHERE NOT EXISTS (SELECT 1 FROM events b
                    WHERE b.event_type = 'purchase' AND b.user_id = c.user_id
                      AND time_bucket(INTERVAL 30 MINUTE, b.ts) = c.ws)
      ORDER BY click_id""",
    "win_window_rank" -> windowRankOracleSql,
    "win_cumulate" -> cumulateOracleSql,
    "win_tumble_tvf_sql" -> tumbleOracleSql,
    "win_hop_tvf_sql" -> hopOracleSql,
    "win_tumble_tvf_expr_sql" -> tumbleOracleSql,
    "win_hop_tvf_expr_sql" -> hopOracleSql,
    "win_cumulate_tvf_sql" -> cumulateOracleSql,
    "win_tumble_legacy_sql" -> tumbleOracleSql,
    "win_hop_legacy_sql" -> hopOracleSql,
    "win_session_legacy_sql" -> sessionOracleSql,
    "win_window_join_tvf_sql" -> windowJoinOracleSql,
    "win_window_rank_tvf_sql" -> windowRankOracleSql,
    "win_window_dedup_tvf_sql" -> windowDedupOracleSql
  )
}
