package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Late-data side capture: the finalized window stays intact and the
 * late row lands in the side output instead of vanishing. */
class LateCaptureSpec extends SparkSuite {

  private def ev(id: Long, tsSec: Long, v: Double, user: Long = 1) =
    Ev(id, user, "e", tsSec * 1000000, v)

  test("late rows surface on the side output; fired windows are not retracted") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Ev]
    val q = LateCapture.tumble(ms.toDS(), 60L * 1000000).toDF()
      .writeStream.format("memory").queryName("t_late").outputMode("append").start()
    try {
      ms.addData(ev(1, 10, 1.0), ev(2, 20, 2.0)) // window [0,60): 2 rows
      q.processAllAvailable()
      ms.addData(ev(3, 200, 3.0)) // watermark → 200s: [0,60) finalizes
      q.processAllAvailable()
      ms.addData(ev(4, 30, 4.0))  // 170s late → side output, not dropped
      q.processAllAvailable()
      ms.addData(ev(5, 400, 5.0)) // watermark → 400s
      q.processAllAvailable()
      ms.addData(ev(6, 500, 6.0)) // next activity closes [180,240)
      q.processAllAvailable()
      val rows = spark.table("t_late").as[LateWinRow].collect()
      val aggs = rows.filter(_.kind == "agg").map(r => r.ws_us / 1000000 -> (r.n, r.sum_cents)).toMap
      assert(aggs(0L) == (2L, 300L), s"window [0,60) wrong: $aggs") // late row did NOT bump it
      assert(aggs(180L) == (1L, 300L))
      assert(!aggs.contains(360L)) // still open: watermark hasn't passed it
      val late = rows.filter(_.kind == "late")
      assert(late.map(_.late_event_id).toList == List(4L))
      assert(late.head.ws_us == 0L) // captured with its intended window
    } finally q.stop()
  }
}
