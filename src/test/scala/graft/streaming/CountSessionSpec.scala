package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Count windows and dynamic-gap sessions: watermark-ordered release,
 * cross-batch window continuity, purging-trigger semantics (incomplete
 * windows never fire), and boundary-closing sessions. NoTimeout state
 * ops are only invoked on input, and batch N runs with the watermark
 * computed from batch N-1 — so each step below feeds a row to advance
 * the clock, like the keyed-sentinel harness does for the gates. */
class CountSessionSpec extends SparkSuite {

  private def ev(id: Long, tsUs: Long, v: Double, user: Long = 1,
      typ: String = "e") = Ev(id, user, typ, tsUs, v)

  private val minUs = 60L * 1000000

  test("countWindow: every Nth released row closes a window; trailing remainder never fires") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Ev]
    val q = CountSession.countWindow(ms.toDS(), n = 2).toDF()
      .writeStream.format("memory").queryName("t_cwin").outputMode("append").start()
    try {
      // batch 1 runs with watermark 0: rows only buffer (out of order)
      ms.addData(ev(3, 30 * minUs, 3.0), ev(1, 10 * minUs, 1.0), ev(2, 20 * minUs, 2.0))
      q.processAllAvailable()
      assert(spark.table("t_cwin").count() == 0)
      // batch 2 sees watermark 30min: rows 1,2 release in (ts, id)
      // order and close window 1; row 3 sits AT the watermark → held
      ms.addData(ev(4, 40 * minUs, 4.0), ev(5, 50 * minUs, 5.0))
      q.processAllAvailable()
      val got1 = spark.table("t_cwin").as[CountWindowRow].collect().toList
      assert(got1 == List(CountWindowRow(1L, 1L, 2L, 300L)))
      // batch 3 sees watermark 50min: rows 3,4 release → window 2
      // continues ACROSS batches; row 5 held, remainder never fires
      ms.addData(ev(6, 90 * minUs, 6.0))
      q.processAllAvailable()
      val got2 = spark.table("t_cwin").as[CountWindowRow].collect().toList.sortBy(_.win_idx)
      assert(got2 == List(CountWindowRow(1L, 1L, 2L, 300L), CountWindowRow(1L, 2L, 2L, 700L)))
    } finally q.stop()
  }

  test("sessionDynamic: per-row gap extends the session; closes when the watermark passes the boundary") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    // local copy: referencing the spec's field from the closure would
    // capture the (non-serializable) suite instance
    val mu = minUs
    val gap: Ev => Long = e => if (e.event_type == "short") 5 * mu else 30 * mu
    val ms = MemoryStream[Ev]
    val q = CountSession.sessionDynamic(ms.toDS(), gap).toDF()
      .writeStream.format("memory").queryName("t_dynsess").outputMode("append").start()
    try {
      // row 1 (short gap → session A closes at 15min), row 2 at 20min
      // is past A's boundary → will start session B (closes at 50min)
      ms.addData(ev(1, 10 * minUs, 1.0, typ = "short"), ev(2, 20 * minUs, 2.0))
      q.processAllAvailable()
      assert(spark.table("t_dynsess").count() == 0) // watermark still 0
      // batch 2 (wm 20min): row 1 releases, opens A, and A's boundary
      // (15min) is already below the watermark → A closes
      ms.addData(ev(3, 40 * minUs, 3.0, typ = "short"))
      q.processAllAvailable()
      val got1 = spark.table("t_dynsess").as[DynSessionRow].collect().toList
      assert(got1 == List(DynSessionRow(1L, 10 * minUs, 15 * minUs, 1L, 100L)))
      // batch 3 (wm 40min): row 2 releases, opens B [20, 50); B stays
      // open (50 > 40). batch 4 (wm 80min): row 3 releases into B —
      // cross-batch extension — 40 < 50, short gap keeps boundary at
      // max(50, 45) = 50; then 50 <= 80 closes B
      ms.addData(ev(4, 80 * minUs, 4.0))
      q.processAllAvailable()
      ms.addData(ev(5, 120 * minUs, 5.0))
      q.processAllAvailable()
      val got2 = spark.table("t_dynsess").as[DynSessionRow].collect().toList.sortBy(_.ws_us)
      assert(got2 == List(
        DynSessionRow(1L, 10 * minUs, 15 * minUs, 1L, 100L),
        DynSessionRow(1L, 20 * minUs, 50 * minUs, 2L, 500L)))
    } finally q.stop()
  }
}
