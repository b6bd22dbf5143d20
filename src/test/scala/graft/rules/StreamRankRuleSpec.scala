package graft.rules

import graft.SparkSuite
import graft.streaming.Ev
import org.apache.spark.sql.catalyst.plans.logical.{FlatMapGroupsWithState, Window}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** StreamRankToTopNRule: the streaming ROW_NUMBER() <= N rank filter
 * plans into the keyed Top-N state operator (reference
 * FlinkLogicalRankRule + StreamExecRank), batch plans stay untouched. */
class StreamRankRuleSpec extends SparkSuite {

  private val rankSql = (view: String) => s"""
    SELECT event_type, event_id, value, rn FROM (
      SELECT event_type, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY event_type
               ORDER BY value DESC, event_id) AS rn
      FROM $view) WHERE rn <= 2"""

  test("streaming rank filter rewrites to the Top-N state op and runs end-to-end") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Ev]
    ms.toDF().createOrReplaceTempView("rank_stream")
    val analyzed = spark.sql(rankSql("rank_stream")).queryExecution.analyzed
    val rewritten = StreamRankToTopNRule(spark)(analyzed)
    assert(rewritten.collectFirst { case w: Window => w }.isEmpty,
      s"Window survived the rewrite:\n$rewritten")
    assert(rewritten.collectFirst { case f: FlatMapGroupsWithState => f }.nonEmpty,
      s"no Top-N state operator in the rewritten plan:\n$rewritten")
    val q = org.apache.spark.sql.graft.SqlShim.ofRows(spark, rewritten)
      .writeStream.format("memory").queryName("t_ranksql")
      .outputMode("update").start()
    try {
      ms.addData(Ev(1, 1, "click", 100, 5.0), Ev(2, 1, "click", 200, 9.0))
      q.processAllAvailable()
      ms.addData(Ev(3, 1, "click", 300, 7.0)) // evicts event 1 from top-2
      q.processAllAvailable()
      val finalTop = spark.table("t_ranksql")
        .select($"event_id", $"value").distinct().as[(Long, Double)].collect().toSet
      // all three candidates passed through the update stream; the
      // final buffer emission carries (2, 3) as ranks 1 and 2
      assert(finalTop == Set((1L, 5.0), (2L, 9.0), (3L, 7.0)))
      val lastRanks = spark.table("t_ranksql")
        .as[(String, Long, Double, Int)].collect()
        .groupBy(_._2).map { case (id, rows) => id -> rows.last._4 }
      assert(lastRanks(2L) == 1 && lastRanks(3L) == 2)
    } finally q.stop()
  }

  test("rn = 1 over a time attribute rewrites to dedup (keep-first updates on earlier arrival)") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Ev]
    ms.toDF()
      .select($"user_id", $"event_id",
        org.apache.spark.sql.functions.expr(
          "cast(timestamp_micros(ts_us) as timestamp_ntz)").as("ts"))
      .createOrReplaceTempView("dedup_stream")
    val analyzed = spark.sql("""
      SELECT user_id, event_id, ts FROM (
        SELECT user_id, event_id, ts,
               ROW_NUMBER() OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS rn
        FROM dedup_stream) WHERE rn = 1""").queryExecution.analyzed
    val rewritten = StreamRankToTopNRule(spark)(analyzed)
    assert(rewritten.collectFirst { case w: Window => w }.isEmpty,
      s"Window survived the dedup rewrite:\n$rewritten")
    val q = org.apache.spark.sql.graft.SqlShim.ofRows(spark, rewritten)
      .writeStream.format("memory").queryName("t_dedupsql")
      .outputMode("update").start()
    try {
      ms.addData(Ev(10, 1, "click", 5000000, 1.0))
      q.processAllAvailable()
      // later batch, EARLIER rowtime: keep-first must re-emit the key
      // with the new winner (RowTimeDeduplicateFunction update)
      ms.addData(Ev(11, 1, "click", 1000000, 1.0), Ev(12, 2, "view", 9000000, 1.0))
      q.processAllAvailable()
      val rows = spark.table("t_dedupsql").as[(Long, Long, java.time.LocalDateTime)]
        .collect().groupBy(_._1).map { case (u, rs) => u -> rs.last._2 }
      assert(rows == Map(1L -> 11L, 2L -> 12L))
    } finally q.stop()
  }

  test("rn = k for k > 1 selects an interior rank and is left untouched") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Ev]
    ms.toDF().createOrReplaceTempView("rank2_stream")
    val analyzed = spark.sql(
      rankSql("rank2_stream").replace("WHERE rn <= 2", "WHERE rn = 2"))
      .queryExecution.analyzed
    val rewritten = StreamRankToTopNRule(spark)(analyzed)
    assert(rewritten.collectFirst { case w: Window => w }.nonEmpty,
      "rn = 2 must stay unsupported (not a Top-N / dedup shape)")
  }

  test("string order columns compare in UTF8 binary order; nulls follow SQL placement") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[(Long, String, Long)]
    ms.toDF().toDF("k", "s", "id").createOrReplaceTempView("str_rank_stream")
    val analyzed = spark.sql("""
      SELECT k, s, id FROM (
        SELECT k, s, id,
               ROW_NUMBER() OVER (PARTITION BY k ORDER BY s, id) AS rn
        FROM str_rank_stream) WHERE rn = 1""").queryExecution.analyzed
    val rewritten = StreamRankToTopNRule(spark)(analyzed)
    assert(rewritten.collectFirst { case w: Window => w }.isEmpty)
    val q = org.apache.spark.sql.graft.SqlShim.ofRows(spark, rewritten)
      .writeStream.format("memory").queryName("t_strrank")
      .outputMode("update").start()
    try {
      // U+FFFD < U+1F600 in UTF-8/code-point order (Spark's sort), but
      // the surrogate pair D83D DE00 < FFFD in UTF-16 code-unit order —
      // a Java-Comparable comparator would pick the emoji and diverge
      // from batch ROW_NUMBER. Key 2 has a NULL order value: ASC
      // defaults to NULLS FIRST, so the null row must win WITHOUT
      // throwing.
      ms.addData((1L, "😀", 1L), (1L, "�", 2L),
                 (2L, "a", 3L), (2L, null, 4L))
      q.processAllAvailable()
      val last = spark.table("t_strrank").as[(Long, String, Long)]
        .collect().groupBy(_._1).map { case (k, rs) => k -> rs.last._3 }
      assert(last == Map(1L -> 2L, 2L -> 4L), s"got $last")
      // and the batch twin agrees on the string pick
      val batch = Seq((1L, "😀", 1L), (1L, "�", 2L))
        .toDF("k", "s", "id")
      batch.createOrReplaceTempView("str_rank_batch")
      val b = spark.sql("""
        SELECT id FROM (SELECT id, ROW_NUMBER() OVER (PARTITION BY k
          ORDER BY s, id) AS rn FROM str_rank_batch) WHERE rn = 1""")
        .as[Long].head()
      assert(b == 2L)
    } finally q.stop()
  }

  test("batch rank filters are left untouched") {
    import spark.implicits._
    Seq((1L, "a", 1.0)).toDF("event_id", "event_type", "value")
      .createOrReplaceTempView("rank_batch")
    val analyzed = spark.sql(rankSql("rank_batch")).queryExecution.analyzed
    val rewritten = StreamRankToTopNRule(spark)(analyzed)
    assert(rewritten.collectFirst { case w: Window => w }.nonEmpty,
      "batch Window must not be rewritten")
  }
}
