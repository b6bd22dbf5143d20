package graft.rules

import graft.SparkSuite
import graft.streaming.Ev
import org.apache.spark.sql.catalyst.plans.logical.Window
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions.{col, row_number}

/** Differential fuzzer for [[StreamRankToTopNRule]]: on random keyed
 * sequences, partition keys, directions, and N, the streaming
 * ROW_NUMBER-filter rewrite (update mode) must reconstruct the exact
 * batch top-N at EVERY ingestion prefix — every row that is ever in
 * the top N was emitted when it entered, so re-ranking the distinct
 * update history equals the batch rank over the same prefix (the
 * reference AppendOnlyTopNFunction's emission contract). Randomized
 * like the OVER-rule differential: the oracle is Spark's own batch
 * Window path, not a hand-computed expectation. */
class StreamTopNDifferentialSpec extends SparkSuite {

  test("streaming Top-N rewrite equals batch row_number at every prefix") {
    implicit val sqlCtx = spark.sqlContext
    implicit val evEnc: org.apache.spark.sql.Encoder[Ev] =
      org.apache.spark.sql.Encoders.product[Ev]
    val rnd = new scala.util.Random(20260814L)
    val types = Vector("a", "b", "c")
    for (case_ <- 0 until 10) {
      val n = 1 + rnd.nextInt(4)
      val desc = rnd.nextBoolean()
      val twoKeys = rnd.nextBoolean()
      val partSql = if (twoKeys) "user_id, event_type" else "event_type"
      val orderSql = s"value ${if (desc) "DESC" else "ASC"}, event_id"
      val nRows = 25 + rnd.nextInt(25)
      val rows = (0 until nRows).map { i =>
        Ev(i.toLong, 1 + rnd.nextInt(2), types(rnd.nextInt(3)), i * 1000000L,
          (rnd.nextInt(500) + 1) / 100.0) // deliberate value ties; id breaks them
      }
      val select = s"""
        SELECT user_id, event_type, event_id, value, rn FROM (
          SELECT user_id, event_type, event_id, value,
                 ROW_NUMBER() OVER (PARTITION BY $partSql
                   ORDER BY $orderSql) AS rn
          FROM %VIEW%) WHERE rn <= $n"""

      val ms = MemoryStream[Ev]
      val view = s"topn_diff_stream_$case_"
      ms.toDF().createOrReplaceTempView(view)
      val analyzed = spark.sql(select.replace("%VIEW%", view))
        .queryExecution.analyzed
      val rewritten = StreamRankToTopNRule(spark)(analyzed)
      assert(rewritten.collectFirst { case w: Window => w }.isEmpty,
        s"case $case_: rank-to-TopN rewrite did not fire")
      val sink = s"t_topndiff_$case_"
      val q = org.apache.spark.sql.graft.SqlShim.ofRows(spark, rewritten)
        .writeStream.format("memory").queryName(sink)
        .outputMode("update").start()
      try {
        val partCols =
          if (twoKeys) Seq(col("user_id"), col("event_type")) else Seq(col("event_type"))
        val ord =
          (if (desc) col("value").desc else col("value").asc) +: Seq(col("event_id").asc)
        val w = W.partitionBy(partCols: _*).orderBy(ord: _*)
        var fed = Vector.empty[Ev]
        val blocks = rows.grouped(5 + rnd.nextInt(8)).toList
        blocks.foreach { b =>
          ms.addData(b: _*); q.processAllAvailable()
          fed ++= b
          import spark.implicits._
          val expect = fed.toDS().toDF()
            .withColumn("rn", row_number().over(w))
            .filter(col("rn") <= n)
            .select("user_id", "event_type", "event_id", "value", "rn")
            .collect().map(_.toSeq).toSet
          val got = spark.table(sink)
            .select("user_id", "event_type", "event_id", "value").distinct()
            .withColumn("rn", row_number().over(w))
            .filter(col("rn") <= n)
            .collect().map(_.toSeq).toSet
          assert(got == expect,
            s"case $case_ (n=$n desc=$desc keys=$partSql) after ${fed.size} rows:\n" +
              s"missing=${(expect -- got).take(5)}\nextra=${(got -- expect).take(5)}")
        }
      } finally q.stop()
    }
  }
}
