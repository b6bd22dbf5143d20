package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** CountEvictor windows: only the last `keep` elements feed the
 * aggregate, windows finalize on watermark passage, and rows for
 * finalized windows are dropped as late. */
class EvictorsSpec extends SparkSuite {

  private def ev(id: Long, user: Long, tsUs: Long, v: Double) =
    Ev(id, user, "click", tsUs, v)

  test("keeps the last N elements per window; finalizes on the watermark") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val minUs = 60L * 1000000
    val ms = MemoryStream[Ev]
    val q = Evictors.tumbleCountEvictor(ms.toDS(), sizeUs = 10 * minUs, keep = 2).toDF()
      .writeStream.format("memory").queryName("t_evict").outputMode("append").start()
    def windows() = spark.table("t_evict").as[EvictWinRow].collect()
      .map(r => r.ws_us / minUs -> (r.n_kept, r.kept_cents)).toMap
    try {
      // window [0, 10min): 3 rows — only the LAST 2 by (ts, id) count
      ms.addData(ev(1, 1, 1 * minUs, 1.0), ev(2, 1, 2 * minUs, 2.0), ev(3, 1, 3 * minUs, 4.0))
      q.processAllAvailable()
      assert(spark.table("t_evict").count() == 0, "window emitted before the watermark closed it")
      ms.addData(ev(9, 1, 25 * minUs, 0.5))  // after this batch wm = 25min
      q.processAllAvailable()
      ms.addData(ev(10, 1, 40 * minUs, 0.5)) // sees wm = 25min: closes [0, 10)
      q.processAllAvailable()
      assert(windows() == Map(0L -> (2L, 600L)), s"kept-2 aggregate wrong: ${windows()}")
      ms.addData(ev(-1, 1, 100 * minUs, 0.0)) // sentinel: sees wm = 40min, closes [20, 30)
      q.processAllAvailable()
      assert(windows() == Map(0L -> (2L, 600L), 20L -> (1L, 50L)), s"got ${windows()}")
      // a late row for the finalized [0, 10min) window must not change
      // it; this batch sees wm = 100min, which finalizes [40, 50)
      ms.addData(ev(11, 1, 5 * minUs, 9.0))
      q.processAllAvailable()
      assert(windows() == Map(0L -> (2L, 600L), 20L -> (1L, 50L), 40L -> (1L, 50L)),
        s"late row re-opened a finalized window: ${windows()}")
    } finally q.stop()
  }

  test("time evictor keeps the trailing span of the window's max ts") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val minUs = 60L * 1000000
    val ms = MemoryStream[Ev]
    val q = Evictors.tumbleTimeEvictor(ms.toDS(), sizeUs = 10 * minUs, keepUs = 3 * minUs).toDF()
      .writeStream.format("memory").queryName("t_tevict").outputMode("append").start()
    def windows() = spark.table("t_tevict").as[EvictTypeWinRow].collect()
      .map(r => r.ws_us / minUs -> (r.n_kept, r.kept_cents)).toMap
    try {
      // [0, 10min): rows at 1, 5, 7, 9 min — max 9, cutoff 9-3=6,
      // kept = {7, 9} (ts <= cutoff evicted, reference TimeEvictor)
      ms.addData(ev(1, 1, 1 * minUs, 1.0), ev(2, 1, 5 * minUs, 2.0),
        ev(3, 1, 7 * minUs, 4.0), ev(4, 1, 9 * minUs, 8.0))
      q.processAllAvailable()
      ms.addData(ev(-1, 1, 100 * minUs, 0.0)) // advance wm beyond the window
      q.processAllAvailable()
      ms.addData(ev(-1, 1, 101 * minUs, 0.0)) // invoke under the new wm
      q.processAllAvailable()
      assert(windows() == Map(0L -> (2L, 1200L)), s"trailing-span keep wrong: ${windows()}")
    } finally q.stop()
  }

  test("delta evictor keeps elements within the threshold of the last element") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val minUs = 60L * 1000000
    val ms = MemoryStream[Ev]
    val q = Evictors.tumbleDeltaEvictor(ms.toDS(), sizeUs = 10 * minUs, thresholdCents = 100L).toDF()
      .writeStream.format("memory").queryName("t_devict").outputMode("append").start()
    def windows() = spark.table("t_devict").as[EvictTypeWinRow].collect()
      .map(r => r.ws_us / minUs -> (r.n_kept, r.kept_cents)).toMap
    try {
      // cents 100, 450, 420, 400; last = 400 → kept |c-400| < 100:
      // {450, 420, 400} (reference DeltaEvictor evicts delta >= t)
      ms.addData(ev(1, 1, 1 * minUs, 1.0), ev(2, 1, 2 * minUs, 4.5),
        ev(3, 1, 3 * minUs, 4.2), ev(4, 1, 4 * minUs, 4.0))
      q.processAllAvailable()
      ms.addData(ev(-1, 1, 100 * minUs, 0.0))
      q.processAllAvailable()
      ms.addData(ev(-1, 1, 101 * minUs, 0.0))
      q.processAllAvailable()
      assert(windows() == Map(0L -> (3L, 1270L)), s"delta keep wrong: ${windows()}")
    } finally q.stop()
  }
}
