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
