package graft.streaming

import graft.SparkSuite
import graft.streaming.StatefulOps.AggChangeRow
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Per-record changelog emission (reference GroupAggFunction.java:43,
 * mini-batch off): the -U/+U cadence, cross-batch buffering under the
 * watermark, strict (ts, id) fold order across batch cuts, and key
 * isolation. Timestamps are second-scale (the watermark is
 * millisecond-floored). */
class PerRecordChangelogSpec extends SparkSuite {
  private val Sec = 1000000L
  private val Far = 7258118400000000L // ~2200-01-01

  test("per-record -U/+U cadence survives out-of-order cross-batch input") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Ev]
    val q = StatefulOps.groupAggChangelogPerRecord(in.toDS()).toDF()
      .writeStream.format("memory").queryName("t_prcl")
      .outputMode("append").start()
    try {
      // batch 1: two rows of key 1, watermark 20s → nothing below it
      // releases with strict (<) until a later mark
      in.addData(Ev(10, 1, "e", 10 * Sec, 1.00), Ev(11, 1, "e", 20 * Sec, 2.00))
      q.processAllAvailable()
      assert(spark.table("t_prcl").isEmpty, "released at the watermark, not past it")

      // batch 2: an OUT-OF-ORDER row at 15s (still above the 20s
      // watermark's release line? no: wm=20s releases ts<20s — but the
      // row arrives in THIS batch, before the mark moves) plus key 2
      in.addData(Ev(12, 1, "e", 15 * Sec, 4.00), Ev(20, 2, "e", 16 * Sec, 8.00))
      q.processAllAvailable()

      // sentinel rounds: advance the watermark far and invoke each key
      for (round <- 1 to 2) {
        in.addData(Ev(-1, 1, "wm", Far + round, 0), Ev(-1, 2, "wm", Far + round, 0))
        q.processAllAvailable()
      }
      val out = spark.table("t_prcl").as[AggChangeRow].collect().toSet
      // key 1 folds in (ts, id) order: 10s(100c), 15s(400c), 20s(200c)
      // — NOT arrival order; the 15s row slots between its batch-1
      // neighbors because release is watermark-gated
      assert(out == Set(
        AggChangeRow(1, 1, "+I", 1, 100),
        AggChangeRow(1, 2, "-U", 1, 100),
        AggChangeRow(1, 3, "+U", 2, 500),
        AggChangeRow(1, 4, "-U", 2, 500),
        AggChangeRow(1, 5, "+U", 3, 700),
        AggChangeRow(2, 1, "+I", 1, 800)
      ), s"got $out")
    } finally q.stop()
  }

  test("log equals the scalar fold on a randomized multi-batch timeline") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val rnd = new scala.util.Random(20260815L)
    for (seed <- 0 until 3) {
      val events = (0 until 40).map { i =>
        Ev(100 + i, 1 + rnd.nextInt(3), "e",
          (1 + rnd.nextInt(50)).toLong * Sec, (1 + rnd.nextInt(900)) / 100.0)
      }
      // random batch cuts
      val cut1 = 5 + rnd.nextInt(15)
      val cut2 = cut1 + 5 + rnd.nextInt(15)
      val in = MemoryStream[Ev]
      val name = s"t_prcl_f$seed"
      // the fixture draws ts over a 50 s range with random batch cuts,
      // so the watermark delay must cover the full disorder — with a
      // smaller delay, cross-batch late rows fold on ARRIVAL (the
      // documented late-data contract), and the log would legitimately
      // diverge from the globally-sorted scalar fold
      val q = StatefulOps.groupAggChangelogPerRecord(in.toDS(),
          watermarkDelay = "60 seconds").toDF()
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        Seq(events.take(cut1), events.slice(cut1, cut2), events.drop(cut2))
          .filter(_.nonEmpty).foreach { b => in.addData(b); q.processAllAvailable() }
        for (round <- 1 to 2) {
          (1L to 3L).foreach(k => in.addData(Ev(-1, k, "wm", Far + round, 0)))
          q.processAllAvailable()
        }
        val got = spark.table(name).as[AggChangeRow].collect().toSet
        val exp = events.groupBy(_.user_id).flatMap { case (k, evs) =>
          var (n, cents, seq) = (0L, 0L, 0L)
          evs.sortBy(e => (e.ts_us, e.event_id)).flatMap { e =>
            val c = math.floor(e.value * 100).toLong
            if (n == 0) {
              n = 1; cents = c; seq += 1
              Seq(AggChangeRow(k, seq, "+I", 1, c))
            } else {
              val before = AggChangeRow(k, seq + 1, "-U", n, cents)
              n += 1; cents += c; seq += 2
              Seq(before, AggChangeRow(k, seq, "+U", n, cents))
            }
          }
        }.toSet
        assert(got == exp, s"seed $seed: log diverged from scalar fold\n" +
          s" only-stream ${(got -- exp).toList.sortBy(r => (r.user_id, r.seq)).take(5)}\n" +
          s" only-fold   ${(exp -- got).toList.sortBy(r => (r.user_id, r.seq)).take(5)}")
      } finally q.stop()
    }
  }
}
