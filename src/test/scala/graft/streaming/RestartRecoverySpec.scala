package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.{Files, Path, Paths}
import java.nio.file.attribute.FileTime
import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

/**
 * Kill-and-restart recovery proofs for the flagship stateful operators
 * (reference exactly-once state recovery, `CheckpointCoordinator.java`
 * and the flink-tests checkpointing ITCases, at the user-visible
 * level): each test feeds the operator a mtime-ordered file sequence
 * (one file per micro-batch), STOPS the query mid-feed with live state
 * in the store, restarts from the SAME checkpoint with the remaining
 * files, and requires
 *
 *  (a) the cross-restart emission to prove the restored state was USED
 *      (a Top-N candidate only present pre-stop, a changelog seq
 *      counter continuing mid-log, a fire_seq re-fire of a pre-stop
 *      firing, a CEP partial match completed across the restart, a
 *      temporal-join version list probed across the restart), and
 *  (b) the complete output to be IDENTICAL to an uninterrupted run of
 *      the same file sequence against a fresh checkpoint — batch
 *      boundaries are file boundaries in both runs, so watermark
 *      evolution matches and any divergence is a state round-trip bug.
 *
 * What round-trips here: kryo/product state envelopes
 * (flatMapGroupsWithState state classes), per-key Top-N buffers,
 * pending watermark-release buffers, accumulator images, per-key log
 * seq counters, window fire_seq counters + fired flags, CEP
 * within-horizon event buffers, and temporal-join version lists.
 */
class RestartRecoverySpec extends SparkSuite {

  private val EvSchema =
    "event_id BIGINT, user_id BIGINT, event_type STRING, ts_us BIGINT, value DOUBLE"

  private def tmp(prefix: String): String =
    Files.createTempDirectory(s"graft_$prefix").toString

  private def parquets(work: String): Set[Path] = {
    val s = Files.list(Paths.get(work))
    try s.iterator().asScala.filter(_.toString.endsWith(".parquet")).toSet
    finally s.close()
  }

  /** Stage one mtime-ordered parquet file (= one micro-batch). */
  private def stage(work: String, rows: Seq[Ev], mtimeMs: Long): Unit = {
    import spark.implicits._
    val before = parquets(work)
    rows.toDF().coalesce(1).write.mode("append").parquet(work)
    (parquets(work) -- before).foreach(p =>
      Files.setLastModifiedTime(p, FileTime.fromMillis(mtimeMs)))
  }

  private def evStream(work: String): Dataset[Ev] = {
    import spark.implicits._
    spark.readStream.schema(EvSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$work/*.parquet")
      .as[Ev]
  }

  /** Run the streaming frame to AvailableNow termination, collecting
   * every emitted row into `sink` (driver-side foreachBatch — test
   * plumbing only; the output accumulates ACROSS restarts, which a
   * memory sink cannot do). */
  private def runCollect[T](ds: Dataset[T], mode: String, ckpt: String,
      sink: ArrayBuffer[T]): Unit = {
    val q = ds.writeStream
      .foreachBatch { (b: Dataset[T], _: Long) =>
        val rows = b.collect()
        sink.synchronized { sink ++= rows }; ()
      }
      .outputMode(mode)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  private val Min = 60L * 1000000L
  private val Sec = 1000000L
  private val Far = 7258118400000000L // ~2200-01-01 in micros

  test("Top-N buffer survives a kill-and-restart (stream_topn state)") {
    import spark.implicits._
    val (work, workU) = (tmp("rst_topn"), tmp("rst_topn_u"))
    val (ckpt, ckptU) = (tmp("rst_topn_ck"), tmp("rst_topn_cku"))
    val f1 = Seq(Ev(1, 1, "click", 10 * Sec, 5.0),
      Ev(2, 1, "click", 20 * Sec, 3.0), Ev(3, 1, "click", 30 * Sec, 8.0))
    val f2 = Seq(Ev(4, 1, "click", 40 * Sec, 6.0))

    def finalTop(rows: Seq[TopNRow]): Seq[(Long, Double)] =
      rows.distinct.sortBy(r => (-r.value, r.event_id)).take(3)
        .map(r => (r.event_id, r.value))

    // interrupted: phase 1 → stop → phase 2 from the same checkpoint
    val got = ArrayBuffer.empty[TopNRow]
    stage(work, f1, 10000L)
    runCollect(StatefulOps.topNByType(evStream(work), 3), "update", ckpt, got)
    val preStop = got.size
    stage(work, f2, 20000L)
    runCollect(StatefulOps.topNByType(evStream(work), 3), "update", ckpt, got)

    // the post-restart emission must contain phase-1 rows that ONLY
    // exist in the restored Top-N buffer (ids 1 and 3 outrank id 4)
    val postRestart = got.drop(preStop).toSeq
    assert(postRestart.map(_.event_id).toSet == Set(3L, 4L, 1L),
      s"restored Top-3 buffer must re-emit with the new candidate merged in; got $postRestart")
    assert(finalTop(got.toSeq) == Seq((3L, 8.0), (4L, 6.0), (1L, 5.0)))

    // uninterrupted twin: identical file sequence, fresh checkpoint
    val gotU = ArrayBuffer.empty[TopNRow]
    stage(workU, f1, 10000L); stage(workU, f2, 20000L)
    runCollect(StatefulOps.topNByType(evStream(workU), 3), "update", ckptU, gotU)
    assert(finalTop(got.toSeq) == finalTop(gotU.toSeq),
      "interrupted and uninterrupted runs must agree on the final Top-N image")
  }

  test("per-record changelog seq counter, accumulator and pending buffer survive a restart") {
    val (work, workU) = (tmp("rst_clog"), tmp("rst_clog_u"))
    val (ckpt, ckptU) = (tmp("rst_clog_ck"), tmp("rst_clog_cku"))
    // f1+f2 run pre-stop: batch 2 runs under the batch-1 watermark
    // (20 s), releasing the 10 s row → +I seq 1 emitted BEFORE the
    // stop; state at stop = acc (1, 100), seq 1, pending {20 s, 30 s}
    val f1 = Seq(Ev(1, 7, "click", 10 * Sec, 1.0), Ev(2, 7, "click", 20 * Sec, 2.0))
    val f2 = Seq(Ev(3, 7, "click", 30 * Sec, 3.0))
    val f3 = Seq(Ev(4, 7, "click", 40 * Sec, 4.0))
    val s1 = Seq(Ev(-1, 7, "sentinel", Far, 0.0))
    val s2 = Seq(Ev(-1, 7, "sentinel", Far + 3600 * Sec, 0.0))
    val files = Seq(f1, f2, f3, s1, s2)

    def run(work: String, ckpt: String, sink: ArrayBuffer[StatefulOps.AggChangeRow]): Unit =
      runCollect(StatefulOps.groupAggChangelogPerRecord(evStream(work)),
        "append", ckpt, sink)

    val got = ArrayBuffer.empty[StatefulOps.AggChangeRow]
    files.take(2).zipWithIndex.foreach { case (f, i) => stage(work, f, 10000L * (i + 1)) }
    run(work, ckpt, got)
    assert(got.toSeq == Seq(StatefulOps.AggChangeRow(7, 1, "+I", 1, 100)),
      s"pre-stop log must carry exactly the released first record; got $got")
    files.drop(2).zipWithIndex.foreach { case (f, i) => stage(work, f, 10000L * (i + 3)) }
    run(work, ckpt, got)

    val expected = Seq(
      StatefulOps.AggChangeRow(7, 1, "+I", 1, 100),
      StatefulOps.AggChangeRow(7, 2, "-U", 1, 100),
      StatefulOps.AggChangeRow(7, 3, "+U", 2, 300),
      StatefulOps.AggChangeRow(7, 4, "-U", 2, 300),
      StatefulOps.AggChangeRow(7, 5, "+U", 3, 600),
      StatefulOps.AggChangeRow(7, 6, "-U", 3, 600),
      StatefulOps.AggChangeRow(7, 7, "+U", 4, 1000))
    assert(got.sortBy(_.seq).toSeq == expected,
      s"seq counter/accumulator must CONTINUE from the restored state mid-log; got ${got.sortBy(_.seq)}")

    val gotU = ArrayBuffer.empty[StatefulOps.AggChangeRow]
    files.zipWithIndex.foreach { case (f, i) => stage(workU, f, 10000L * (i + 1)) }
    run(workU, ckptU, gotU)
    assert(got.sortBy(_.seq).toSeq == gotU.sortBy(_.seq).toSeq,
      "interrupted and uninterrupted per-record logs must be identical")
  }

  test("allowed-lateness window accumulator, fired flag and fire_seq survive a restart") {
    val (work, workU) = (tmp("rst_ref"), tmp("rst_ref_u"))
    val (ckpt, ckptU) = (tmp("rst_ref_ck"), tmp("rst_ref_cku"))
    // 15-min tumble, 1-day lateness. f1 fills W0=[0,15m) and W1=[15,30m);
    // f2's sentinel invokes the key under wm=20m → W0 FIRES (seq 0) pre-
    // stop. Post-restart, the LATE row at 5m must RE-FIRE W0 with the
    // cumulative content and fire_seq 1 — accumulator, fired flag and
    // fire counter all come from the restored state.
    val f1 = Seq(Ev(1, 1, "click", 1 * Min, 1.0),
      Ev(2, 1, "click", 2 * Min, 2.0), Ev(9, 1, "click", 20 * Min, 9.0))
    val f2 = Seq(Ev(-1, 1, "sentinel", 30 * Min, 0.0))
    val f3 = Seq(Ev(3, 1, "click", 5 * Min, 5.0)) // late for W0, within lateness
    val s1 = Seq(Ev(-1, 1, "sentinel", Far, 0.0))
    val s2 = Seq(Ev(-1, 1, "sentinel", Far + 3600 * Sec, 0.0))
    val files = Seq(f1, f2, f3, s1, s2)

    def run(work: String, ckpt: String, sink: ArrayBuffer[LatenessWinRow]): Unit =
      runCollect(LateCapture.tumbleWithLateness(evStream(work),
        15 * Min, 86400L * Sec), "append", ckpt, sink)

    val got = ArrayBuffer.empty[LatenessWinRow]
    files.take(2).zipWithIndex.foreach { case (f, i) => stage(work, f, 10000L * (i + 1)) }
    run(work, ckpt, got)
    assert(got.toSeq == Seq(LatenessWinRow("agg", 1, 0, 0, 2, 300, -1)),
      s"W0 must fire once (on-time content) before the stop; got $got")
    files.drop(2).zipWithIndex.foreach { case (f, i) => stage(work, f, 10000L * (i + 3)) }
    run(work, ckpt, got)

    val fin = got.filter(_.kind != "late").groupBy(_.ws_us).map { case (ws, rows) =>
      val last = rows.maxBy(_.fire_seq)
      (ws, last.n, last.sum_cents, rows.size)
    }.toSet
    assert(fin == Set((0L, 3L, 800L, 2), (15 * Min, 1L, 900L, 1)),
      s"W0 must re-fire cumulatively (fires=2, n=3) from restored window state; got $fin")

    val gotU = ArrayBuffer.empty[LatenessWinRow]
    files.zipWithIndex.foreach { case (f, i) => stage(workU, f, 10000L * (i + 1)) }
    run(workU, ckptU, gotU)
    assert(got.toSeq.sortBy(r => (r.ws_us, r.fire_seq)) ==
      gotU.toSeq.sortBy(r => (r.ws_us, r.fire_seq)),
      "interrupted and uninterrupted firing logs must be identical")
  }

  test("CEP partial match completes across a restart (within-horizon buffer)") {
    val (work, workU) = (tmp("rst_cep"), tmp("rst_cep_u"))
    val (ckpt, ckptU) = (tmp("rst_cep_ck"), tmp("rst_cep_cku"))
    val pattern = Cep.Pattern
      .begin("a", (e: Ev) => e.event_type == "click")
      .followedBy("b", (e: Ev) => e.event_type == "purchase")
      .within(3600L * Sec)
    // f1: the click only → a PARTIAL match lives in the buffer at stop;
    // f2: the purchase completes it across the restart
    val f1 = Seq(Ev(1, 1, "click", 10 * Sec, 1.0))
    val f2 = Seq(Ev(2, 1, "purchase", 20 * Sec, 2.0))
    val s1 = Seq(Ev(-1, 1, "sentinel", Far, 0.0))
    val s2 = Seq(Ev(-1, 1, "sentinel", Far + 3600 * Sec, 0.0))
    val files = Seq(f1, f2, s1, s2)

    def run(work: String, ckpt: String, sink: ArrayBuffer[CepMatch]): Unit = {
      import spark.implicits._
      runCollect(Cep.runBound(evStream(work), pattern, "0 seconds")
        .map(b => CepMatch(b.user_id, b.binds.map(_.ev.event_id), b.start_us, b.end_us)),
        "append", ckpt, sink)
    }

    val got = ArrayBuffer.empty[CepMatch]
    files.take(1).zipWithIndex.foreach { case (f, i) => stage(work, f, 10000L * (i + 1)) }
    run(work, ckpt, got)
    assert(got.isEmpty, s"no complete match may emit before the stop; got $got")
    files.drop(1).zipWithIndex.foreach { case (f, i) => stage(work, f, 10000L * (i + 2)) }
    run(work, ckpt, got)
    assert(got.toSeq == Seq(CepMatch(1, Seq(1, 2), 10 * Sec, 20 * Sec)),
      s"the pre-stop click must pair with the post-restart purchase; got $got")

    val gotU = ArrayBuffer.empty[CepMatch]
    files.zipWithIndex.foreach { case (f, i) => stage(workU, f, 10000L * (i + 1)) }
    run(workU, ckptU, gotU)
    assert(got.toSeq == gotU.toSeq,
      "interrupted and uninterrupted CEP matches must be identical")
  }

  test("temporal-join version list and held probes survive a restart") {
    import spark.implicits._
    val (work, workU) = (tmp("rst_tj"), tmp("rst_tj_u"))
    val (ckpt, ckptU) = (tmp("rst_tj_ck"), tmp("rst_tj_cku"))
    // one staged stream, event_type discriminates dim rows ("v") from
    // probe rows ("p"); sentinel probes drive the final flush. At the
    // stop, the state holds BOTH the v1 version row and the unreleased
    // probe p1 — the restart must join p1 to v1 and p2 to v2.
    val f1 = Seq(Ev(100, 5, "v", 10 * Sec, 111.0), Ev(1, 5, "p", 15 * Sec, 0.0))
    val f2 = Seq(Ev(101, 5, "v", 40 * Sec, 222.0), Ev(2, 5, "p", 45 * Sec, 0.0))
    val s1 = Seq(Ev(-1, 5, "p", Far, 0.0))
    val s2 = Seq(Ev(-1, 5, "p", Far + 3600 * Sec, 0.0))
    val files = Seq(f1, f2, s1, s2)

    def run(work: String, ckpt: String,
        sink: ArrayBuffer[(Long, Option[Long], Option[Double])]): Unit = {
      val env = evStream(work)
      val dims = env.filter(_.event_type == "v")
      val probes = env.filter(e => e.event_type == "p")
      val joined = TemporalJoin.runTyped(dims, probes,
        "user_id", "ts_us", "event_id", "user_id", "ts_us", "event_id",
        watermarkDelay = "0 seconds")
        .map(j => (j.probe.event_id, j.dim.map(_.event_id), j.dim.map(_.value)))
      runCollect(joined, "append", ckpt, sink)
    }

    val got = ArrayBuffer.empty[(Long, Option[Long], Option[Double])]
    files.take(1).zipWithIndex.foreach { case (f, i) => stage(work, f, 10000L * (i + 1)) }
    run(work, ckpt, got)
    assert(got.forall(_._1 < 0),
      s"probe p1 must still be HELD (watermark has not passed it) at the stop; got $got")
    val preStop = got.size
    files.drop(1).zipWithIndex.foreach { case (f, i) => stage(work, f, 10000L * (i + 2)) }
    run(work, ckpt, got)

    val real = got.filter(_._1 >= 0).sortBy(_._1).toSeq
    assert(real == Seq((1L, Some(100L), Some(111.0)), (2L, Some(101L), Some(222.0))),
      s"p1 must join the RESTORED v1 version, p2 the post-restart v2; got $real")

    val gotU = ArrayBuffer.empty[(Long, Option[Long], Option[Double])]
    files.zipWithIndex.foreach { case (f, i) => stage(workU, f, 10000L * (i + 1)) }
    run(workU, ckptU, gotU)
    assert(got.filter(_._1 >= 0).sortBy(_._1).toSeq ==
      gotU.filter(_._1 >= 0).sortBy(_._1).toSeq,
      "interrupted and uninterrupted temporal joins must be identical")
  }
}
