package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Randomized differential for the DeltaTrigger and
 * ContinuousEventTimeTrigger analogs: random event sets over two keys
 * and several windows, cut into random micro-batches (ordered batch
 * ranges, arbitrary intra-batch order — so no row is ever late and
 * the documented "firing sequence is a pure function of the event
 * data" contract applies), checked against scalar simulators of the
 * reference semantics (DeltaTrigger.java:52-64 rolling baseline;
 * ContinuousEventTimeTrigger.java:51-92 aligned boundary grid + final
 * pane). Cross-batch pending/rearm/close state is the fuzzed axis —
 * the class of seam where the CEP and session fuzzers found real
 * defects. */
class TriggersDifferentialSpec extends SparkSuite {

  private val secUs = 1000000L
  private val minUs = 60L * secUs
  private val sizeUs = 10 * minUs

  private case class R(key: String, ts: Long, id: Long, cents: Long, v: Double)

  /** Random rows sorted by ts, cut into ordered batches at random
   * positions (each batch's ts range follows the previous batch's). */
  private def genBatches(rnd: scala.util.Random): List[List[R]] = {
    val keys = Vector("a", "b")
    val n = 12 + rnd.nextInt(14)
    val rows = (0 until n).map { i =>
      val v = (1 + rnd.nextInt(50)) / 10.0 // 0.1 .. 5.0
      R(keys(rnd.nextInt(2)), rnd.nextInt(2400) * secUs, i + 1,
        math.floor(v * 100).toLong, v)
    }.sortBy(r => (r.ts, r.id)).toList
    val cuts = 2 + rnd.nextInt(4)
    val marks = (0 until cuts).map(_ => rnd.nextInt(n + 1)).sorted
    val bounds = (0 +: marks :+ n).distinct
    bounds.sliding(2).map { case Seq(a, b) => rnd.shuffle(rows.slice(a, b)) }
      .filter(_.nonEmpty).toList
  }

  private def deltaSim(rows: List[R], thr: Long): Set[(String, Long, Long, Long, Long)] = {
    val out = Set.newBuilder[(String, Long, Long, Long, Long)]
    rows.groupBy(r => (r.key, Math.floorDiv(r.ts, sizeUs) * sizeUs)).foreach {
      case ((key, ws), group) =>
        var (b, n, s, armed) = (0L, 0L, 0L, false)
        group.sortBy(r => (r.ts, r.id)).foreach { r =>
          n += 1; s += r.cents
          if (!armed) { b = r.cents; armed = true }
          else if (math.abs(r.cents - b) > thr) {
            out += ((key, ws, r.id, n, s)); b = r.cents
          }
        }
    }
    out.result()
  }

  private def contSim(rows: List[R], ivUs: Long): Set[(String, Long, Long, Long, Long)] = {
    val out = Set.newBuilder[(String, Long, Long, Long, Long)]
    rows.groupBy(r => (r.key, Math.floorDiv(r.ts, sizeUs) * sizeUs)).foreach {
      case ((key, ws), group) =>
        val we = ws + sizeUs
        val mn = group.map(_.ts).min
        var b = Math.floorDiv(mn, ivUs) * ivUs + ivUs
        while (b < we) {
          val in = group.filter(_.ts < b)
          out += ((key, ws, b, in.size.toLong, in.map(_.cents).sum))
          b += ivUs
        }
        out += ((key, ws, we, group.size.toLong, group.map(_.cents).sum))
    }
    out.result()
  }

  private def runStream[T](batches: List[List[R]], name: String)(
      mk: org.apache.spark.sql.Dataset[Ev] => org.apache.spark.sql.Dataset[T]): Unit = {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Ev]
    val q = mk(ms.toDS()).toDF().writeStream.format("memory")
      .queryName(name).outputMode("append").start()
    try {
      batches.foreach { b =>
        ms.addData(b.map(r => Ev(r.id, 1, r.key, r.ts, r.v)))
        q.processAllAvailable()
      }
      for (round <- 1 to 2) {
        ms.addData(Ev(-1, 1, "a", (100000 + round) * minUs, 0.0),
          Ev(-1, 1, "b", (100000 + round) * minUs, 0.0))
        q.processAllAvailable()
      }
    } finally q.stop()
  }

  private def purgeSim(rows: List[R], n: Int): Set[(String, Long, Long, Long, Long)] = {
    val out = Set.newBuilder[(String, Long, Long, Long, Long)]
    rows.groupBy(r => (r.key, Math.floorDiv(r.ts, sizeUs) * sizeUs)).foreach {
      case ((key, ws), group) =>
        group.sortBy(r => (r.ts, r.id)).grouped(n).zipWithIndex
          .filter(_._1.size == n) // trailing partial pane never fires
          .foreach { case (pane, i) =>
            out += ((key, ws, i + 1L, n.toLong, pane.map(_.cents).sum))
          }
    }
    out.result()
  }

  test("purging count trigger equals the pane-chunking simulator on random batch cuts") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260820L)
    for (case_ <- 0 until 6) {
      val n = 2 + rnd.nextInt(3)
      val batches = genBatches(rnd)
      runStream(batches, "t_ptrig_fuzz")(
        ds => Triggers.tumblePurgingCountTrigger(ds, sizeUs, n))
      val got = spark.table("t_ptrig_fuzz").as[PurgeFireRow].collect()
        .map(r => (r.event_type, r.ws_us, r.fire_idx, r.n_rows, r.pane_cents)).toSet
      val want = purgeSim(batches.flatten, n)
      assert(got == want,
        s"case $case_ n=$n: got ${got.toList.sorted} want ${want.toList.sorted}")
      spark.sql("DROP TABLE IF EXISTS t_ptrig_fuzz")
    }
  }

  test("delta trigger equals the rolling-baseline simulator on random batch cuts") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260818L)
    for (case_ <- 0 until 6) {
      val thr = Vector(50L, 100L, 200L)(rnd.nextInt(3))
      val batches = genBatches(rnd)
      runStream(batches, "t_dtrig_fuzz")(
        ds => Triggers.tumbleDeltaTrigger(ds, sizeUs, thr))
      val got = spark.table("t_dtrig_fuzz").as[DeltaFireRow].collect()
        .map(r => (r.event_type, r.ws_us, r.fire_id, r.n_at_fire, r.cents_at_fire)).toSet
      val want = deltaSim(batches.flatten, thr)
      assert(got == want,
        s"case $case_ thr=$thr: got ${got.toList.sorted} want ${want.toList.sorted}")
      spark.sql("DROP TABLE IF EXISTS t_dtrig_fuzz")
    }
  }

  test("continuous trigger equals the boundary-grid simulator on random batch cuts") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260819L)
    for (case_ <- 0 until 6) {
      val iv = Vector(2, 3, 5)(rnd.nextInt(3)) * minUs
      val batches = genBatches(rnd)
      runStream(batches, "t_ctrig_fuzz")(
        ds => Triggers.tumbleContinuousTrigger(ds, sizeUs, iv))
      val got = spark.table("t_ctrig_fuzz").as[ContFireRow].collect()
        .map(r => (r.event_type, r.ws_us, r.fire_us, r.n_so_far, r.cents_so_far)).toSet
      val want = contSim(batches.flatten, iv)
      assert(got == want,
        s"case $case_ iv=$iv: got ${got.toList.sorted} want ${want.toList.sorted}")
      spark.sql("DROP TABLE IF EXISTS t_ctrig_fuzz")
    }
  }
}
