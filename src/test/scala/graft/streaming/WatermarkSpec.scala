package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/**
 * Watermark semantics (SURVEY §7.5 documented divergence: the
 * reference's allowedLateness retracts/updates fired windows; Spark
 * drops rows later than the watermark): a too-late row is excluded
 * from its already-finalized window.
 */
class WatermarkSpec extends SparkSuite {

  test("append-mode windowed agg drops rows later than the watermark") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[(Long, java.sql.Timestamp)]
    val agg = ms.toDS().toDF("id", "ts")
      .withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "1 minute"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("long").as("ws"), col("n"))
    val q = agg.writeStream.format("memory").queryName("t_wm").outputMode("append").start()
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000)
    try {
      ms.addData((1L, t(10)), (2L, t(20)))   // window [0,60): 2 rows
      q.processAllAvailable()
      ms.addData((3L, t(200)))               // advances watermark to 190 → [0,60) finalizes
      q.processAllAvailable()
      ms.addData((4L, t(30)))                // 160s late → dropped
      q.processAllAvailable()
      ms.addData((5L, t(400)))               // close [180,240) too
      q.processAllAvailable()
      val rows = spark.table("t_wm").as[(Long, Long)].collect().toMap
      assert(rows(0L) == 2L)   // late row 4 did NOT bump the count
      assert(rows(180L) == 1L)
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark dedups within the event-time horizon") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[(Long, java.sql.Timestamp)]
    val dd = ms.toDS().toDF("k", "ts")
      .withWatermark("ts", "10 seconds")
      .dropDuplicatesWithinWatermark("k")
    val q = dd.writeStream.format("memory").queryName("t_ddw").outputMode("append").start()
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000)
    try {
      ms.addData((1L, t(10)), (1L, t(12)))  // duplicate inside horizon
      q.processAllAvailable()
      val n = spark.table("t_ddw").count()
      assert(n == 1)
    } finally q.stop()
  }
}
