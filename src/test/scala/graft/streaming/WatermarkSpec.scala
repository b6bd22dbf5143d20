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

  test("idle-source handling: multipleWatermarkPolicy max lets a stalled input advance") {
    // Reference WatermarksWithIdleness (flink-core/.../eventtime/
    // WatermarksWithIdleness.java): an idle source stops holding the
    // combined watermark back. Spark's analog is a config swap —
    // `multipleWatermarkPolicy=max` tracks the FASTEST input instead of
    // the default min, so a union with one stalled leg still finalizes
    // windows (the min policy would wedge them open forever).
    val ss = spark.newSession()
    ss.conf.set("spark.sql.streaming.multipleWatermarkPolicy", "max")
    implicit val sql = ss.sqlContext
    import ss.implicits._
    val live = MemoryStream[(Long, java.sql.Timestamp)]
    val idle = MemoryStream[(Long, java.sql.Timestamp)]
    def leg(ms: MemoryStream[(Long, java.sql.Timestamp)]) =
      ms.toDS().toDF("id", "ts").withWatermark("ts", "5 seconds")
    val agg = leg(live).union(leg(idle))
      .groupBy(window(col("ts"), "1 minute"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("long").as("ws"), col("n"))
    val q = agg.writeStream.format("memory").queryName("t_idle").outputMode("append").start()
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000)
    try {
      live.addData((1L, t(10)))
      idle.addData((2L, t(20)))   // idle leg's last row — watermark 15s
      q.processAllAvailable()
      live.addData((3L, t(200))) // live leg advances to 195s; idle stays 15s
      q.processAllAvailable()
      live.addData((4L, t(400))) // under max policy the [0,60) window closes
      q.processAllAvailable()
      val rows = ss.table("t_idle").as[(Long, Long)].collect().toMap
      assert(rows.get(0L).contains(2L),
        s"stalled leg blocked the combined watermark: $rows")
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
