package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** DeltaTrigger and ContinuousEventTimeTrigger analogs: firing points
 * are a pure function of the event data, released as the watermark
 * passes them — micro-batch boundaries cannot change what fires. */
class TriggersSpec extends SparkSuite {

  private def ev(id: Long, tsUs: Long, v: Double) = Ev(id, 1, "click", tsUs, v)

  test("delta trigger fires on threshold jumps from the rolling baseline") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val minUs = 60L * 1000000
    val ms = MemoryStream[Ev]
    val q = Triggers.tumbleDeltaTrigger(ms.toDS(), sizeUs = 10 * minUs, thresholdCents = 100L).toDF()
      .writeStream.format("memory").queryName("t_dtrig").outputMode("append").start()
    def fires() = spark.table("t_dtrig").as[DeltaFireRow].collect()
      .map(r => (r.fire_id, r.n_at_fire, r.cents_at_fire)).toSet
    try {
      // cents 100 (arms baseline), 150 (+50, no), 250 (+150 FIRE,
      // rebase), 300 (+50, no), 420 (+170 FIRE)
      ms.addData(ev(1, 1 * minUs, 1.0), ev(2, 2 * minUs, 1.5), ev(3, 3 * minUs, 2.5),
        ev(4, 4 * minUs, 3.0), ev(5, 5 * minUs, 4.2))
      q.processAllAvailable()
      ms.addData(ev(-1, 100 * minUs, 0.0)) // advance wm past the rows
      q.processAllAvailable()
      ms.addData(ev(-1, 101 * minUs, 0.0)) // release under the new wm
      q.processAllAvailable()
      assert(fires() == Set((3L, 3L, 500L), (5L, 5L, 1220L)), s"fires wrong: ${fires()}")
      // no end-of-window firing beyond the two delta fires
      assert(spark.table("t_dtrig").count() == 2)
    } finally q.stop()
  }

  test("continuous trigger fires each interval boundary as the watermark passes it, then the window end") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val minUs = 60L * 1000000
    val ms = MemoryStream[Ev]
    val q = Triggers.tumbleContinuousTrigger(ms.toDS(), sizeUs = 10 * minUs, intervalUs = 2 * minUs).toDF()
      .writeStream.format("memory").queryName("t_ctrig").outputMode("append").start()
    def fires() = spark.table("t_ctrig").as[ContFireRow].collect()
      .filter(_.ws_us == 0L)
      .map(r => (r.fire_us / minUs, r.n_so_far, r.cents_so_far)).toSet
    try {
      // rows at 1min(100c), 3min(200c); first boundary = align(1min,
      // 2min) + 2min = 2min
      ms.addData(ev(1, 1 * minUs, 1.0), ev(2, 3 * minUs, 2.0))
      q.processAllAvailable()
      // the 5min row's batch sees wm=3min and fires the 2min boundary
      // (only the 1min row absorbed); the armed event-time timeout then
      // fires the 4min boundary as soon as wm=5min lands — boundaries
      // fire off the watermark itself, no new data needed (the
      // reference's timer behavior)
      ms.addData(ev(3, 5 * minUs, 3.0))
      q.processAllAvailable()
      assert(fires() == Set((2L, 1L, 100L), (4L, 2L, 300L)),
        s"watermark-driven boundary fires wrong: ${fires()}")
      // wm=100min: boundaries 6, 8 and the final 10min pane all fire
      ms.addData(ev(-1, 100 * minUs, 0.0))
      q.processAllAvailable()
      val full = Set((2L, 1L, 100L), (4L, 2L, 300L), (6L, 3L, 600L),
        (8L, 3L, 600L), (10L, 3L, 600L))
      assert(fires() == full, s"full fire set wrong: ${fires()}")
      // a further watermark advance must not re-fire anything
      ms.addData(ev(-1, 101 * minUs, 0.0))
      q.processAllAvailable()
      assert(fires() == full, s"re-fired after close: ${fires()}")
    } finally q.stop()
  }
}
