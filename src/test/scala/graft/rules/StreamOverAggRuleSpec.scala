package graft.rules

import graft.SparkSuite
import graft.streaming.Ev
import org.apache.spark.sql.catalyst.plans.logical.{FlatMapGroupsWithState, Window}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, timestamp_micros}

/** StreamOverAggRule: streaming window-aggregate SQL plans into the
 * keyed watermark-released state op (reference StreamExecOverAggregate);
 * frames stay correct across micro-batch boundaries; batch plans and
 * unsupported shapes stay untouched. */
class StreamOverAggRuleSpec extends SparkSuite {

  private def overSql(view: String, frame: String) = s"""
    SELECT user_id, event_id,
           count(*) OVER w AS n,
           sum(cents) OVER w AS s
    FROM (SELECT user_id, event_id, __event_ts,
                 CAST(floor(value * 100) AS BIGINT) AS cents FROM $view)
    WINDOW w AS (PARTITION BY user_id ORDER BY __event_ts $frame)"""

  private def stream(name: String)(implicit sql: org.apache.spark.sql.SQLContext) = {
    implicit val evEnc: org.apache.spark.sql.Encoder[Ev] =
      org.apache.spark.sql.Encoders.product[Ev]
    val ms = MemoryStream[Ev]
    ms.toDF()
      .withColumn("__event_ts", timestamp_micros(col("ts_us")))
      .withWatermark("__event_ts", "0 seconds")
      .createOrReplaceTempView(name)
    ms
  }

  test("bounded ROWS frame rewrites and computes frames across batch boundaries") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val ms = stream("over_stream_rows")
    val analyzed = spark.sql(overSql("over_stream_rows",
      "ROWS BETWEEN 1 PRECEDING AND CURRENT ROW")).queryExecution.analyzed
    val rewritten = StreamOverAggRule(spark)(analyzed)
    assert(rewritten.collectFirst { case w: Window => w }.isEmpty,
      s"Window survived:\n$rewritten")
    assert(rewritten.collectFirst { case f: FlatMapGroupsWithState => f }.nonEmpty)
    val q = org.apache.spark.sql.graft.SqlShim.ofRows(spark, rewritten)
      .writeStream.format("memory").queryName("t_oversql")
      .outputMode("append").start()
    try {
      // batch 1: rows at 100/200; watermark 0 → nothing released
      ms.addData(Ev(1, 1, "a", 100L * 1000000, 1.0), Ev(2, 1, "a", 200L * 1000000, 2.0))
      q.processAllAvailable()
      // batch 2: row at 400 advances watermark past 100 and 200; the
      // frame of row 2 must include row 1 from the PREVIOUS batch
      ms.addData(Ev(3, 1, "a", 400L * 1000000, 4.0))
      q.processAllAvailable()
      // batch 3: far-future sentinel releases row 3 (frame = rows 2,3)
      ms.addData(Ev(4, 1, "a", 999999L * 1000000, 0.0))
      q.processAllAvailable()
      val got = spark.table("t_oversql").as[(Long, Long, Long, Long)]
        .collect().toList.sortBy(_._2).map { case (_, id, n, s) => (id, n, s) }
      assert(got == List((1L, 1L, 100L), (2L, 2L, 300L), (3L, 2L, 600L)),
        s"frames wrong: $got")
    } finally q.stop()
  }

  test("unbounded default frame becomes O(1) running accumulators") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val ms = stream("over_stream_run")
    val analyzed = spark.sql(overSql("over_stream_run", "")).queryExecution.analyzed
    val rewritten = StreamOverAggRule(spark)(analyzed)
    assert(rewritten.collectFirst { case w: Window => w }.isEmpty)
    val q = org.apache.spark.sql.graft.SqlShim.ofRows(spark, rewritten)
      .writeStream.format("memory").queryName("t_overrun")
      .outputMode("append").start()
    try {
      ms.addData(Ev(1, 1, "a", 100L * 1000000, 1.0), Ev(2, 1, "a", 200L * 1000000, 2.0))
      q.processAllAvailable()
      ms.addData(Ev(3, 1, "a", 999999L * 1000000, 0.0)) // release 1, 2
      q.processAllAvailable()
      val got = spark.table("t_overrun").as[(Long, Long, Long, Long)]
        .collect().toList.sortBy(_._2).map { case (_, id, n, s) => (id, n, s) }
      assert(got == List((1L, 1L, 100L), (2L, 2L, 300L)), s"running totals wrong: $got")
    } finally q.stop()
  }

  test("composite partition keys: (user_id, event_type) aggregate independently") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val ms = stream("over_stream_comp")
    val analyzed = spark.sql("""
      SELECT user_id, event_type, event_id, sum(cents) OVER w AS s
      FROM (SELECT user_id, event_type, event_id, __event_ts,
                   CAST(floor(value * 100) AS BIGINT) AS cents FROM over_stream_comp)
      WINDOW w AS (PARTITION BY user_id, event_type ORDER BY __event_ts)""")
      .queryExecution.analyzed
    val rewritten = StreamOverAggRule(spark)(analyzed)
    assert(rewritten.collectFirst { case w: Window => w }.isEmpty)
    val q = org.apache.spark.sql.graft.SqlShim.ofRows(spark, rewritten)
      .writeStream.format("memory").queryName("t_overcomp")
      .outputMode("append").start()
    try {
      ms.addData(
        Ev(1, 1, "a", 100L * 1000000, 1.0), Ev(2, 1, "b", 200L * 1000000, 2.0),
        Ev(3, 1, "a", 300L * 1000000, 3.0))
      q.processAllAvailable()
      ms.addData(Ev(4, 1, "a", 999999L * 1000000, 0.0), Ev(5, 1, "b", 999999L * 1000000, 0.0))
      q.processAllAvailable()
      val got = spark.table("t_overcomp").as[(Long, String, Long, Long)]
        .collect().toList.sortBy(_._3).map { case (_, t, id, s) => (t, id, s) }
      // the (1, b) running total must NOT include the (1, a) rows
      assert(got == List(("a", 1L, 100L), ("b", 2L, 200L), ("a", 3L, 400L)),
        s"composite keys leaked across: $got")
    } finally q.stop()
  }

  test("ROWS UNBOUNDED ties emit per-row; RANGE UNBOUNDED ties share the frame") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val ms = stream("over_stream_ties")
    val analyzed = spark.sql("""
      SELECT user_id, event_id,
             count(*) OVER (PARTITION BY user_id ORDER BY __event_ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nrows,
             count(*) OVER (PARTITION BY user_id ORDER BY __event_ts) AS npeer,
             var_samp(cents) OVER (PARTITION BY user_id ORDER BY __event_ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v
      FROM (SELECT user_id, event_id, __event_ts,
                   CAST(floor(value * 100) AS BIGINT) AS cents FROM over_stream_ties)""")
      .queryExecution.analyzed
    val rewritten = StreamOverAggRule(spark)(analyzed)
    assert(rewritten.collectFirst { case w: Window => w }.isEmpty)
    val q = org.apache.spark.sql.graft.SqlShim.ofRows(spark, rewritten)
      .writeStream.format("memory").queryName("t_overties")
      .outputMode("append").start()
    try {
      // two rows at the SAME event time: a ROWS UNBOUNDED frame is
      // per-row (running 1, 2 — the ADVICE tie defect), a RANGE
      // UNBOUNDED (default) frame is peer-inclusive (2, 2)
      ms.addData(Ev(1, 1, "a", 100L * 1000000, 1.0), Ev(2, 1, "a", 100L * 1000000, 2.0))
      q.processAllAvailable()
      ms.addData(Ev(3, 1, "a", 999999L * 1000000, 0.0))
      q.processAllAvailable()
      val got = spark.table("t_overties")
        .as[(Long, Long, Long, Long, Option[Double])].collect().toList
      assert(got.map(_._3).sorted == List(1L, 2L), s"ROWS ties not per-row: $got")
      assert(got.map(_._4) == List(2L, 2L), s"RANGE ties not peer-shared: $got")
      // running var_samp: NULL at n=1, then ((100-150)²+(200-150)²)/1
      assert(got.map(_._5).toSet == Set(None, Some(5000.0)), s"var wrong: $got")
    } finally q.stop()
  }

  test("mixed frames in one SELECT evaluate each expression over its own frame") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val ms = stream("over_stream_mixed")
    val analyzed = spark.sql("""
      SELECT user_id, event_id,
             sum(cents) OVER (PARTITION BY user_id ORDER BY __event_ts
               ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS s_rows,
             count(*) OVER (PARTITION BY user_id ORDER BY __event_ts
               RANGE BETWEEN INTERVAL '100' SECOND PRECEDING AND CURRENT ROW) AS n_range,
             count(*) OVER (PARTITION BY user_id ORDER BY __event_ts) AS n_run
      FROM (SELECT user_id, event_id, __event_ts,
                   CAST(floor(value * 100) AS BIGINT) AS cents FROM over_stream_mixed)""")
      .queryExecution.analyzed
    val rewritten = StreamOverAggRule(spark)(analyzed)
    assert(rewritten.collectFirst { case w: Window => w }.isEmpty,
      s"Window survived:\n$rewritten")
    val q = org.apache.spark.sql.graft.SqlShim.ofRows(spark, rewritten)
      .writeStream.format("memory").queryName("t_overmixed")
      .outputMode("append").start()
    try {
      // ts 100, 150, 300: ROWS 1 frame pairs adjacent rows; the
      // 100-second RANGE frame holds {100,150}, then {300} alone;
      // the running count ignores both bounds
      ms.addData(Ev(1, 1, "a", 100L * 1000000, 1.0), Ev(2, 1, "a", 150L * 1000000, 2.0))
      q.processAllAvailable()
      ms.addData(Ev(3, 1, "a", 300L * 1000000, 4.0))
      q.processAllAvailable()
      ms.addData(Ev(4, 1, "a", 999999L * 1000000, 0.0))
      q.processAllAvailable()
      val got = spark.table("t_overmixed").as[(Long, Long, Long, Long, Long)]
        .collect().toList.sortBy(_._2).map { case (_, id, s, nr, ng) => (id, s, nr, ng) }
      assert(got == List((1L, 100L, 1L, 1L), (2L, 300L, 2L, 2L), (3L, 600L, 1L, 3L)),
        s"mixed frames wrong: $got")
    } finally q.stop()
  }

  test("batch plans and non-aggregate windows are left untouched") {
    import spark.implicits._
    // batch: rule must not fire
    Seq((1L, 1L, 100.0)).toDF("user_id", "event_id", "value")
      .createOrReplaceTempView("over_batch")
    val batchPlan = spark.sql("""
      SELECT user_id, sum(value) OVER (PARTITION BY user_id ORDER BY event_id) AS s
      FROM over_batch""").queryExecution.analyzed
    assert(StreamOverAggRule(spark)(batchPlan).collectFirst { case w: Window => w }.nonEmpty)
  }
}
