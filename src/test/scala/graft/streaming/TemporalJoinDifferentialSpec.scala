package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Differential fuzzer for [[TemporalJoin]]: random version histories
 * and probe streams (with deliberate same-instant ties on both sides)
 * fed in time-ordered random batch cuts must equal a scalar as-of
 * simulator computed over the full history — the reference
 * `TemporalRowTimeJoinOperator` contract (enrich each probe with the
 * newest version at-or-before its time; seq breaks same-time ties).
 * Random cuts attack exactly the cross-batch machinery: watermark
 * pruning of the version list (newest at-or-below must survive),
 * strict release of probes AT the watermark, and late dim versions
 * landing under held probes. Same ordered-random-batch harness as the
 * retraction-join / session / evictor differentials. */
class TemporalJoinDifferentialSpec extends SparkSuite {

  private val FarUs = 4102444800000000L // ~2100-01-01, flushes the watermark

  test("streaming temporal join equals the scalar as-of oracle on random histories and batch cuts") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val seed = 20260815L
    val rnd = new scala.util.Random(seed)

    for (case_ <- 0 until 10) {
      val nKeys = 1 + rnd.nextInt(3)
      val nDims = 5 + rnd.nextInt(15)
      val nProbes = 8 + rnd.nextInt(15)
      // whole-second timestamps over a small range so same-instant
      // ties (dim-dim and dim-probe) are common
      def ts(): Long = (1 + rnd.nextInt(12)) * 1000000L
      val dims = (1 to nDims).map(i =>
        DimV(1 + rnd.nextInt(nKeys), ts(), i.toLong, i * 10.0))
      val probes = (1 to nProbes).map(i =>
        PrbV(1 + rnd.nextInt(nKeys), ts(), 1000L + i))

      // scalar as-of oracle over the complete history: newest version
      // at-or-before the probe's time, seq max on same-time ties
      val expected: Map[Long, Option[Long]] = probes.map { p =>
        val v = dims.filter(d => d.k == p.k && d.t <= p.t)
          .sortBy(d => (d.t, d.seq)).lastOption
        p.id -> v.map(_.seq)
      }.toMap

      // time-ordered merged feed, random batch cuts, random order
      // WITHIN each batch (the watermark is computed between batches).
      // Cuts land only where the timestamp STRICTLY increases: with
      // delay 0, an event tied with the previous batch's max is
      // at-or-below the watermark and Spark's stateful-exec late-row
      // filter (EventTimeTimeout) drops it before the join logic —
      // the documented late-data contract, not what this differential
      // targets. (A first draft cut anywhere and "found" exactly that
      // drop: a dim version tied with the watermark vanished.)
      val merged: Seq[Either[DimV, PrbV]] =
        (dims.map(Left(_)) ++ probes.map(Right(_)))
          .sortBy(e => e.fold(_.t, _.t))
      val strictCuts = (1 until merged.size)
        .filter(i => merged(i - 1).fold(_.t, _.t) < merged(i).fold(_.t, _.t))
      val nBatches = 2 + rnd.nextInt(4)
      val cuts = (Seq(0, merged.size) ++
        Seq.fill(nBatches - 1)(
          if (strictCuts.isEmpty) 0 else strictCuts(rnd.nextInt(strictCuts.size)))
      ).distinct.sorted
      val batches = cuts.sliding(2).map { w =>
        rnd.shuffle(merged.slice(w.head, w.last))
      }.toSeq.filter(_.nonEmpty)

      val dimsIn = MemoryStream[DimV]
      val probesIn = MemoryStream[PrbV]
      val name = s"t_tjdiff_$case_"
      val q = TemporalJoin.runTyped(dimsIn.toDS(), probesIn.toDS(),
          "k", "t", "seq", "k", "t", "id", "0 seconds").toDF()
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        batches.foreach { b =>
          val (ds, ps) = (b.collect { case Left(d) => d }, b.collect { case Right(p) => p })
          if (ds.nonEmpty) dimsIn.addData(ds)
          if (ps.nonEmpty) probesIn.addData(ps)
          q.processAllAvailable()
        }
        dimsIn.addData(DimV(1, FarUs, 999999L, 0.0)) // flush
        q.processAllAvailable()
        q.processAllAvailable() // timer-driven release needs one more cycle
        val got = spark.table(name)
          .select($"probe.id", $"dim.seq").as[(Long, Option[Long])]
          .collect().toMap
        assert(got == expected,
          s"case $case_ (seed $seed): streaming temporal join diverged from " +
          s"the as-of oracle\n  dims=$dims\n  probes=$probes\n" +
          s"  batches=${batches.map(b => b.map(_.fold(d => s"D${d.seq}@${d.t}", p => s"P${p.id}@${p.t}")))}\n" +
          expected.keys.toSeq.sorted
            .filter(id => got.get(id) != Some(expected(id)))
            .take(5).map(id => s"  probe $id: got=${got.get(id)} want=${expected(id)}")
            .mkString("\n"))
      } finally q.stop()
    }
  }
}
