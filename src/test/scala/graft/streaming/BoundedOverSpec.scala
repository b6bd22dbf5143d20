package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Event-time bounded streaming OVER: watermark-gated release, frame
 * math for ROWS and RANGE, late-row dropping, and watermark-bounded
 * state. */
class BoundedOverSpec extends SparkSuite {

  private def ev(id: Long, tsUs: Long, v: Double, user: Long = 1) =
    Ev(id, user, "e", tsUs, v)

  test("ROWS frame: released in event order, computed over the last N released rows") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Ev]
    val q = BoundedOver.run(ms.toDS(), BoundedOver.RowsFrame(1)).toDF()
      .writeStream.format("memory").queryName("t_bo_rows").outputMode("append").start()
    try {
      ms.addData(ev(1, 10000000, 1.0), ev(2, 20000000, 2.0))
      q.processAllAvailable()
      // watermark lands AT 20s: row 1 is strictly below it → released;
      // row 2 sits at the watermark → held (a same-ts peer could still
      // arrive), released only once the watermark passes 20s
      val got1 = spark.table("t_bo_rows").as[BoundedOverRow].collect().sortBy(_.event_id)
      assert(got1.map(r => (r.event_id, r.frame_n, r.frame_cents)).toList ==
        List((1L, 1L, 100L)))
      ms.addData(ev(3, 15000000, 9.0)) // later than watermark → dropped
      q.processAllAvailable()
      ms.addData(ev(4, 30000000, 4.0))
      q.processAllAvailable()
      // row 4 sits AT the watermark → held until the watermark passes it
      assert(spark.table("t_bo_rows").count() == 2)
      ms.addData(ev(5, 40000000, 5.0)) // advances the watermark past row 4
      q.processAllAvailable()
      val got2 = spark.table("t_bo_rows").as[BoundedOverRow].collect().sortBy(_.event_id)
      // row 3 was dropped as late, so row 4's frame is {2, 4}; row 5 is
      // at the new watermark and still held
      assert(got2.map(r => (r.event_id, r.frame_n, r.frame_cents)).toList ==
        List((1L, 1L, 100L), (2L, 2L, 300L), (4L, 2L, 600L)))
    } finally q.stop()
  }

  test("RANGE frame: same-ts peers share the frame; state prunes to the range horizon") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, size}
    val ms = MemoryStream[Ev]
    val ckpt = java.nio.file.Files.createTempDirectory("graft_bo_range").toString
    val q = BoundedOver.run(ms.toDS(), BoundedOver.RangeFrame(10000000L)).toDF() // 10s range
      .writeStream.format("memory").queryName("t_bo_range").outputMode("append")
      .option("checkpointLocation", ckpt).start()
    try {
      ms.addData(ev(1, 10000000, 1.0), ev(2, 15000000, 2.0), ev(3, 15000000, 3.0))
      q.processAllAvailable()
      val got = spark.table("t_bo_range").as[BoundedOverRow].collect().sortBy(_.event_id)
      // watermark at 15s: only row 1 is strictly below it; the 15s peer
      // group (rows 2, 3) is held until the watermark passes 15s so a
      // late-arriving peer can never split the shared frame
      assert(got.map(r => (r.event_id, r.frame_n, r.frame_cents)).toList ==
        List((1L, 1L, 100L)))
      // advance an hour per batch: history prunes to the 10s horizon
      val hourUs = 3600L * 1000000
      (1 to 4).foreach { b =>
        ms.addData(ev(10 + b, b * hourUs, 1.0))
        q.processAllAvailable()
      }
      // the peer group released together once the watermark passed 15s:
      // rows 2 and 3 share one frame {1,2,3}
      val got2 = spark.table("t_bo_range").as[BoundedOverRow].collect().sortBy(_.event_id)
      assert(got2.filter(r => r.event_id == 2 || r.event_id == 3)
        .map(r => (r.event_id, r.frame_n, r.frame_cents)).toList ==
        List((2L, 3L, 600L), (3L, 3L, 600L)))
      val histSizes = spark.read.format("statestore").load(ckpt)
        .select(size(col("value.groupState.history"))).as[Int].collect()
      assert(histSizes.nonEmpty && histSizes.forall(_ <= 3),
        s"history not pruned to range horizon: ${histSizes.toList}")
      val pendSizes = spark.read.format("statestore").load(ckpt)
        .select(size(col("value.groupState.pending"))).as[Int].collect()
      // only the newest row (at the watermark) may still be pending
      assert(pendSizes.forall(_ <= 1), s"pending not watermark-bounded: ${pendSizes.toList}")
    } finally q.stop()
  }
}
