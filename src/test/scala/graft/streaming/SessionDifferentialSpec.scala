package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Randomized differential for dynamic-gap session windows
 * (SessionWindowTimeGapExtractor analog): random keyed event sets with
 * a per-event gap, cut into random micro-batches (nondecreasing in
 * event time across batches, shuffled within a batch), must produce
 * exactly the sessions of a driver-side sweep over the ts-sorted
 * events — extend while ts < close boundary, close otherwise, the
 * boundary rule CountSessionSpec pins deterministically. The batching
 * and the watermark-driven release are the fuzzed axes (cross-batch
 * pending buffers, sessions spanning batch cuts, boundary ties).
 * Timestamps are minute-scale: the watermark is ms-floored. */
class SessionDifferentialSpec extends SparkSuite {

  private val minUs = 60L * 1000000

  test("dynamic-gap sessions equal the batch sweep under any batching") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val rnd = new scala.util.Random(20260818L)
    val mu = minUs // local: the gap closure must not capture the spec class
    for (case_ <- 0 until 6) {
      val nKeys = 1 + rnd.nextInt(3)
      val gapMod = 1 + rnd.nextInt(3)
      val gap: Ev => Long = e => (1L + e.event_id % gapMod) * mu
      val nEvents = 20 + rnd.nextInt(25)
      // minute timestamps with deliberate ties within and across keys
      val events = (0 until nEvents).map { i =>
        Ev(i.toLong, 1L + rnd.nextInt(nKeys),
          "e", rnd.nextInt(40).toLong * minUs, (rnd.nextInt(500) + 1) / 100.0)
      }.sortBy(e => (e.ts_us, e.event_id))
      // random batch cuts on the sorted order (so every batch's rows
      // are at/after the watermark the previous batch established)
      val cuts = (Seq(0, nEvents) ++ Seq.fill(1 + rnd.nextInt(3))(rnd.nextInt(nEvents)))
        .distinct.sorted
      val batches = cuts.zip(cuts.tail).map { case (a, b) =>
        rnd.shuffle(events.slice(a, b))
      }.filter(_.nonEmpty)

      // driver sweep: same extend/close rule per key
      def cents(e: Ev): Long = math.floor(e.value * 100).toLong
      val expected = events.groupBy(_.user_id).flatMap { case (k, evs) =>
        val out = List.newBuilder[(Long, Long, Long, Long, Long)]
        var open: Option[(Long, Long, Long, Long)] = None
        evs.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
          val end = e.ts_us + gap(e)
          open = open match {
            case Some((ws, we, n, sum)) if e.ts_us < we =>
              Some((ws, math.max(we, end), n + 1, sum + cents(e)))
            case Some((ws, we, n, sum)) =>
              out += ((k, ws, we, n, sum))
              Some((e.ts_us, end, 1L, cents(e)))
            case None => Some((e.ts_us, end, 1L, cents(e)))
          }
        }
        open.foreach { case (ws, we, n, sum) => out += ((k, ws, we, n, sum)) }
        out.result()
      }.toSet

      val ms = MemoryStream[Ev]
      val sink = s"t_sessdiff_$case_"
      val q = CountSession.sessionDynamic(ms.toDS(), gap).toDF()
        .writeStream.format("memory").queryName(sink).outputMode("append").start()
      try {
        batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
        // keyed sentinels, twice: first advances the watermark past
        // every boundary, second invokes each key under it
        val flushTs = events.map(_.ts_us).max + 1000 * minUs
        for (_ <- 0 until 2) {
          ms.addData((1 to nKeys).map(k => Ev(-1L, k.toLong, "e", flushTs, 0.0)): _*)
          q.processAllAvailable()
        }
        val got = spark.table(sink).as[DynSessionRow].collect()
          .map(r => (r.user_id, r.ws_us, r.we_us, r.n, r.sum_cents)).toSet
        assert(got == expected,
          s"case $case_ (${batches.size} batches): sessions diverged\n" +
          s" got ${got.toList.sorted}\n exp ${expected.toList.sorted}")
      } finally q.stop()
    }
  }
}
