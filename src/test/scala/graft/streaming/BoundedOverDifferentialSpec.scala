package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Differential fuzzer for [[BoundedOver]]: random keyed timelines
 * (with deliberate event-time ties) under random ROWS/RANGE frames and
 * random batch cuts must equal a scalar frame oracle computed over the
 * complete sorted history — the reference's
 * RowTimeRows/RangeBoundedPrecedingFunction semantics (ROWS frames
 * order by the unique (time, id); RANGE frames share one frame across
 * the whole same-ts peer group). Cuts land only on strict time
 * increases, as in TemporalJoinDifferentialSpec: the stateful exec's
 * late-row filter is the documented lateness contract, not this
 * test's target. */
class BoundedOverDifferentialSpec extends SparkSuite {

  private val FarUs = 4102444800000000L

  test("streaming bounded OVER equals the scalar frame oracle on random timelines, frames, and cuts") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val seed = 20260815L
    val rnd = new scala.util.Random(seed)

    for (case_ <- 0 until 8) {
      val nKeys = 1 + rnd.nextInt(3)
      val n = 15 + rnd.nextInt(25)
      val evs = (1 to n).map { i =>
        Ev(i.toLong, 1 + rnd.nextInt(nKeys), "t",
          (1 + rnd.nextInt(10)) * 1000000L, rnd.nextInt(500) / 100.0)
      }
      val frame: BoundedOver.Frame =
        if (rnd.nextBoolean()) BoundedOver.RowsFrame(1 + rnd.nextInt(4))
        else BoundedOver.RangeFrame((1 + rnd.nextInt(5)) * 1000000L)

      def centsOf(e: Ev): Long = math.floor(e.value * 100).toLong
      // scalar oracle over the complete history
      val expected: Map[Long, (Long, Long)] = frame match {
        case BoundedOver.RowsFrame(p) =>
          evs.groupBy(_.user_id).values.flatMap { ks =>
            val sorted = ks.sortBy(e => (e.ts_us, e.event_id))
            sorted.zipWithIndex.map { case (e, i) =>
              val fr = sorted.slice(math.max(0, i - p), i + 1)
              e.event_id -> (fr.size.toLong, fr.map(centsOf).sum)
            }
          }.toMap
        case BoundedOver.RangeFrame(r) =>
          evs.map { e =>
            val fr = evs.filter(x =>
              x.user_id == e.user_id && x.ts_us >= e.ts_us - r && x.ts_us <= e.ts_us)
            e.event_id -> (fr.size.toLong, fr.map(centsOf).sum)
          }.toMap
      }

      val sorted = evs.sortBy(_.ts_us)
      val strictCuts = (1 until sorted.size)
        .filter(i => sorted(i - 1).ts_us < sorted(i).ts_us)
      val nBatches = 2 + rnd.nextInt(4)
      val cuts = (Seq(0, sorted.size) ++ Seq.fill(nBatches - 1)(
        if (strictCuts.isEmpty) 0 else strictCuts(rnd.nextInt(strictCuts.size)))
      ).distinct.sorted
      val batches = cuts.sliding(2)
        .map(w => rnd.shuffle(sorted.slice(w.head, w.last))).toSeq.filter(_.nonEmpty)

      val in = MemoryStream[Ev]
      val name = s"t_bodiff_$case_"
      val q = BoundedOver.run(in.toDS(), frame).toDF()
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        batches.foreach { b => in.addData(b); q.processAllAvailable() }
        in.addData(Ev(999999L, 1, "flush", FarUs, 0.0))
        q.processAllAvailable()
        q.processAllAvailable()
        val got = spark.table(name)
          .filter($"event_id" < 999999L)
          .select($"event_id", $"frame_n", $"frame_cents")
          .as[(Long, Long, Long)].collect()
          .map(r => r._1 -> (r._2, r._3)).toMap
        assert(got == expected,
          s"case $case_ (seed $seed): bounded OVER diverged from the frame " +
          s"oracle [frame=$frame]\n" +
          expected.keys.toSeq.sorted.filter(id => got.get(id) != Some(expected(id)))
            .take(5).map(id => s"  event $id: got=${got.get(id)} want=${expected(id)}")
            .mkString("\n"))
      } finally q.stop()
    }
  }
}
