package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/**
 * Trigger-semantics emulation (reference
 * `flink-streaming-java/.../windowing/triggers/`): Spark exposes no
 * per-window trigger API, so
 *  - EARLY FIRING (ContinuousEventTimeTrigger / early-fire config) maps
 *    to update-mode emission of open windows every micro-batch;
 *  - CountTrigger maps to a keyed state op firing every N elements.
 */
class TriggerSpec extends SparkSuite {

  test("early firing: update mode emits open-window partials before the window closes") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[(Long, java.sql.Timestamp)]
    val agg = ms.toDS().toDF("id", "ts")
      .withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "1 minute"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("long").as("ws"), col("n"))
    val q = agg.writeStream.format("memory").queryName("t_early")
      .outputMode("update").start()
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000)
    try {
      ms.addData((1L, t(10)))
      q.processAllAvailable()
      // window [0,60) is still OPEN (watermark 0) yet a partial fired
      val early = spark.table("t_early").as[(Long, Long)].collect().toList
      assert(early == List((0L, 1L)), s"no early firing: $early")
      ms.addData((2L, t(20)))
      q.processAllAvailable()
      // second early fire updates the same window
      val fired = spark.table("t_early").as[(Long, Long)].collect().toList
      assert(fired.contains((0L, 2L)), s"no refinement: $fired")
    } finally q.stop()
  }

  test("count trigger: fires the running aggregate every N elements per key") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Ev]
    val q = StatefulOps.countTriggered(ms.toDS(), 2).toDF()
      .writeStream.format("memory").queryName("t_cnt").outputMode("append").start()
    def ev(id: Long, v: Double) = Ev(id, 1, "e", id * 1000, v)
    try {
      ms.addData(ev(1, 1.0), ev(2, 2.0), ev(3, 3.0))
      q.processAllAvailable()
      ms.addData(ev(4, 4.0))
      q.processAllAvailable()
      val fires = spark.table("t_cnt").as[RunningRow].collect().sortBy(_.event_id).toList
      // fires at rows 2 and 4 only, with cumulative state across batches
      assert(fires.map(r => (r.event_id, r.running_n, r.running_cents)) ==
        List((2L, 2L, 300L), (4L, 4L, 1000L)), s"got $fires")
    } finally q.stop()
  }
}
