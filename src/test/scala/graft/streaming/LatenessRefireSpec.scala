package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Firing discipline of [[LateCapture.tumbleWithLateness]] (reference
 * `WindowedStream.allowedLateness` + `sideOutputLateData`): windows
 * fire once when the watermark passes their end, re-fire cumulatively
 * per late-but-allowed batch, capture beyond-lateness rows on the late
 * side, and evict state only at end + lateness. */
class LatenessRefireSpec extends SparkSuite {

  private val Sec = 1000000L
  private val FarUs = 7258118400000000L // ~2200-01-01

  private def ev(id: Long, key: Long, tsSec: Long, v: Double = 1.0) =
    Ev(id, key, "t", tsSec * Sec, v)

  private def run(name: String, latenessUs: Long, batches: Seq[Seq[Ev]]): Seq[(String, Long, Long, Long, Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Ev]
    val q = LateCapture.tumbleWithLateness(in.toDS(), 10L * Sec, latenessUs).toDF()
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      for (round <- 1 to 2) {
        in.addData(Ev(-round, 1L, "flush", FarUs + round, 0.0))
        q.processAllAvailable()
      }
      spark.table(name)
        .select($"kind", $"ws_us", $"fire_seq", $"n", $"sum_cents", $"late_event_id")
        .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
        .map(r => (r._1, r._2 / Sec, r._3, r._4, r._5, r._6))
    } finally q.stop()
  }

  test("late-but-allowed rows re-fire the window cumulatively; first firing carries on-time content") {
    // size 10s, lateness 30s
    val got = run("t_refire1", 30L * Sec, Seq(
      Seq(ev(1, 1, 2), ev(2, 1, 4), ev(3, 1, 12), ev(4, 1, 25)), // wm -> 25s
      // windows [0,10) and [10,20) are due: they fire FIRST with
      // on-time content, THEN the late row updates [0,10)
      Seq(ev(5, 1, 3), ev(6, 1, 26)) // wm -> 26s
    ))
    assert(got.toSet == Set(
      ("agg", 0L, 0L, 2L, 200L, -1L),    // e1+e2, fired at wm=25
      ("agg", 10L, 0L, 1L, 100L, -1L),   // e3
      ("update", 0L, 1L, 3L, 300L, -1L), // +e5 cumulative
      ("agg", 20L, 0L, 2L, 200L, -1L)    // e4+e6, fired at the sentinel
    ), s"got $got")
  }

  test("beyond-lateness rows go to the late side; within-lateness rows update; eviction at end+lateness") {
    // size 10s, lateness 5s
    val got = run("t_refire2", 5L * Sec, Seq(
      Seq(ev(1, 1, 2), ev(2, 1, 14)),  // wm -> 14s
      Seq(ev(3, 1, 3, 2.0)),           // [0,10) due+fired, 15 > 14: update
      Seq(ev(4, 1, 30)),               // wm -> 30s
      Seq(ev(5, 1, 4))                 // [0,10): 15 <= 30 -> captured late
    ))
    assert(got.toSet == Set(
      ("agg", 0L, 0L, 1L, 100L, -1L),    // e1, fired at wm=14
      ("update", 0L, 1L, 2L, 300L, -1L), // +e3 (200 cents)
      ("agg", 10L, 0L, 1L, 100L, -1L),   // e2, fired when wm=30 reached the key
      ("late", 0L, -1L, 0L, 0L, 5L),     // e5 beyond lateness
      ("agg", 30L, 0L, 1L, 100L, -1L)    // e4, fired at the sentinel
    ), s"got $got")
  }

  private def runSession(name: String, gapUs: Long, latenessUs: Long,
      batches: Seq[Seq[Ev]], perElement: Boolean = false)
      : Seq[(String, Long, Long, Long, Long, Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Ev]
    val q = LateCapture.sessionWithLateness(in.toDS(), gapUs, latenessUs,
        perElement = perElement).toDF()
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      for (round <- 1 to 2) {
        in.addData(Ev(-round, 1L, "flush", FarUs + round, 0.0))
        q.processAllAvailable()
      }
      spark.table(name)
        .select($"kind", $"ws_us", $"we_us", $"emit_seq", $"n", $"sum_cents", $"late_event_id")
        .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
        .map(r => (r._1, r._2 / Sec, r._3 / Sec, r._4, r._5, r._6, r._7))
    } finally q.stop()
  }

  test("a late row bridges two fired sessions into one merged re-firing") {
    // gap 10s, lateness 200s
    val got = runSession("t_sessref1", 10L * Sec, 200L * Sec, Seq(
      Seq(ev(1, 1, 5), ev(2, 1, 30), ev(3, 1, 100)), // wm -> 100
      // A=[5,15) and B=[30,40) fire first; then e5@12 merges into A,
      // e4@20 bridges the merged A' and B -> one cumulative update
      Seq(ev(4, 1, 20, 2.0), ev(5, 1, 12, 3.0))
    ))
    assert(got.toSet == Set(
      ("agg", 5L, 15L, 0L, 1L, 100L, -1L),     // A on-time firing
      ("agg", 30L, 40L, 1L, 1L, 100L, -1L),    // B on-time firing
      ("update", 5L, 40L, 2L, 4L, 700L, -1L),  // merged A+e5+e4+B
      ("agg", 100L, 110L, 3L, 1L, 100L, -1L)   // e3 at the sentinel
    ), s"got $got")
    // the gate's supersession rule recovers the batch islands
    val finals = got.filter(_._1 != "late").filter { a =>
      !got.exists(b => b._1 != "late" && b._4 > a._4 &&
        b._2 <= a._3 && a._2 <= b._3)
    }.map(r => (r._2, r._3, r._5)).toSet
    assert(finals == Set((5L, 40L, 4L), (100L, 110L, 1L)), s"finals $finals")
  }

  test("per-element session mode: each late row fires its own merged extent (reference cadence)") {
    // Same bridge scenario as above, but per-element (the reference's
    // WindowOperator.processElement → EventTimeTrigger.onElement FIRE
    // on merged windows): e5 fires the A+e5 merge on its own, then e4
    // fires the full bridge — TWO firings with different extents where
    // the coalesced mode emits one. Window identity changes across the
    // merges, which is exactly what the firing log must surface.
    val got = runSession("t_sessref_pe1", 10L * Sec, 200L * Sec, Seq(
      Seq(ev(1, 1, 5), ev(2, 1, 30), ev(3, 1, 100)), // wm -> 100
      // processed in (ts, id) order: e5@12 first, then e4@20
      Seq(ev(4, 1, 20, 2.0), ev(5, 1, 12, 3.0))
    ), perElement = true)
    assert(got.toSet == Set(
      ("agg", 5L, 15L, 0L, 1L, 100L, -1L),     // A on-time firing
      ("agg", 30L, 40L, 1L, 1L, 100L, -1L),    // B on-time firing
      ("update", 5L, 22L, 2L, 2L, 400L, -1L),  // e5 fires A+e5 alone
      ("update", 5L, 40L, 3L, 4L, 700L, -1L),  // e4 fires the full bridge
      ("agg", 100L, 110L, 4L, 1L, 100L, -1L)   // e3 at the sentinel
    ), s"got $got")
    // supersession still recovers the batch islands from the log
    val finals = got.filter(_._1 != "late").filter { a =>
      !got.exists(b => b._1 != "late" && b._4 > a._4 &&
        b._2 <= a._3 && a._2 <= b._3)
    }.map(r => (r._2, r._3, r._5)).toSet
    assert(finals == Set((5L, 40L, 4L), (100L, 110L, 1L)), s"finals $finals")
  }

  test("per-element session mode: a late row into a NOT-due session accumulates silently") {
    // gap 10s, lateness 200s: e4@95 merges into e3's session [95,120)
    // (e3@100 + e5@110) whose end 120 > wm 110 — no per-element firing;
    // the merged session fires ONCE at the sentinel with everything
    val got = runSession("t_sessref_pe2", 10L * Sec, 200L * Sec, Seq(
      Seq(ev(1, 1, 5), ev(3, 1, 100), ev(5, 1, 110)), // wm -> 110
      Seq(ev(4, 1, 95, 2.0))
    ), perElement = true)
    assert(got.toSet == Set(
      ("agg", 5L, 15L, 0L, 1L, 100L, -1L),
      ("agg", 95L, 120L, 1L, 3L, 400L, -1L) // merged, fired once at sentinel
    ), s"got $got")
  }

  test("a beyond-lateness row is captured; sessions evict at end + lateness") {
    // gap 10s, lateness 60s: e4@20 has 20+10+60=90 <= wm=100 -> late side
    val got = runSession("t_sessref2", 10L * Sec, 60L * Sec, Seq(
      Seq(ev(1, 1, 5), ev(2, 1, 30), ev(3, 1, 100)),
      Seq(ev(4, 1, 20))
    ))
    assert(got.toSet == Set(
      ("agg", 5L, 15L, 0L, 1L, 100L, -1L),
      ("agg", 30L, 40L, 1L, 1L, 100L, -1L),
      ("late", 20L, 30L, -1L, 0L, 0L, 4L),
      ("agg", 100L, 110L, 2L, 1L, 100L, -1L)
    ), s"got $got")
  }

  test("elements exactly gap apart share one session (touch-or-overlap merge)") {
    val got = runSession("t_sessref3", 10L * Sec, 60L * Sec, Seq(
      Seq(ev(1, 1, 5), ev(2, 1, 15), ev(3, 1, 26), ev(4, 1, 100))
    ))
    // 5 and 15 are exactly gap apart -> one session [5,25); 26 > 25
    // starts a new one
    assert(got.toSet == Set(
      ("agg", 5L, 25L, 0L, 2L, 200L, -1L),
      ("agg", 26L, 36L, 1L, 1L, 100L, -1L),
      ("agg", 100L, 110L, 2L, 1L, 100L, -1L)
    ), s"got $got")
  }

  test("a window created entirely by late-but-allowed rows fires once with their content") {
    // size 10s, lateness 60s; window [10,20) has no on-time rows
    val got = run("t_refire3", 60L * Sec, Seq(
      Seq(ev(1, 1, 2), ev(2, 1, 35)),  // wm -> 35s
      Seq(ev(3, 1, 12), ev(4, 1, 13))  // [10,20) born late, due -> first agg
    ))
    assert(got.toSet == Set(
      ("agg", 0L, 0L, 1L, 100L, -1L),
      ("agg", 10L, 0L, 2L, 200L, -1L), // late-born window: ONE firing, kind agg
      ("agg", 30L, 0L, 1L, 100L, -1L)
    ), s"got $got")
  }
}
