package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/**
 * Savepoint rescaling (reference StateAssignmentOperation.java:60 —
 * key-group redistribution when a savepoint restores at a different
 * parallelism). Pins the three contract points the oracle gate
 * `state_rescale_totals` cannot see from its final image alone:
 *
 *  1. the savepoint read returns EXACTLY the stopped query's per-key
 *     state (not an output replay);
 *  2. the resumed query's state store physically spans the NEW, larger
 *     partition count — keys moved;
 *  3. rescaled output == the uninterrupted single-run output, row for
 *     row, for every fed key.
 */
class RescaleSpec extends SparkSuite {

  private def sessionAt(partitions: Int): SparkSession = {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", partitions.toString)
    // transformWithState needs column families → RocksDB provider
    // (also the faithful pairing: the reference's savepoint story is
    // EmbeddedRocksDBStateBackend's)
    ss.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    ss
  }

  /** Feed `evs` through the totals fold (optionally seeded), one batch,
   * checkpointed at `ckpt`; returns the update rows it emitted. */
  private def runTotals(ss: SparkSession, evs: Seq[Ev], ckpt: String,
      seed: Option[Seq[BootTotal]]): Seq[BootTotal] = {
    implicit val sql = ss.sqlContext
    import ss.implicits._
    val ms = MemoryStream[Ev]
    val seedDs = seed.map(s => ss.createDataset(s)).getOrElse(ss.emptyDataset[BootTotal])
    val name = StreamOps.freshName("t_rescale")
    val q = Rescale.resumeTotals(ms.toDS(), seedDs).toDF()
      .writeStream.format("memory").queryName(name)
      .outputMode("update").option("checkpointLocation", ckpt).start()
    try {
      ms.addData(evs: _*)
      q.processAllAvailable()
    } finally q.stop()
    ss.table(name).as[BootTotal].collect().toSeq
  }

  private def evsA = Seq( // phase 1: three users land in a 2-partition store
    Ev(1, 10, "a", 100, 1.00), Ev(2, 11, "a", 110, 2.00),
    Ev(3, 12, "a", 120, 3.00), Ev(4, 10, "b", 130, 0.50))
  private def evsB = Seq( // phase 2: one old user continues, two are new
    Ev(5, 10, "c", 200, 1.25), Ev(6, 13, "a", 210, 4.00),
    Ev(7, 14, "a", 220, 5.00))

  test("savepoint read returns the stopped query's per-key state exactly") {
    val ss = sessionAt(2)
    val ckpt = Files.createTempDirectory("graft_rsc_sp").toString
    runTotals(ss, evsA, ckpt, None)
    import ss.implicits._
    val sp = Rescale.savepointTotals(ss, ckpt).collect()
      .map(t => t.user_id -> ((t.n, t.cents))).toMap
    assert(sp == Map(10L -> ((2L, 150L)), 11L -> ((1L, 200L)), 12L -> ((1L, 300L))))
    // and it came from no more store partitions than the old layout had
    val parts = Rescale.savepointTotalsWithPartition(ss, ckpt)
      .select("partition_id").distinct().collect().map(_.getInt(0)).toSet
    assert(parts.size <= 2, s"old layout leaked: $parts")
  }

  test("queryable-state point read: one key's live value out of a checkpoint") {
    val ss = sessionAt(2)
    val ckpt = Files.createTempDirectory("graft_rsc_pr").toString
    runTotals(ss, evsA, ckpt, None)
    // key 10 folded two events (150 cents); generic path, no projection
    val got = Rescale.pointRead(ss, ckpt, 10L, Some("totals"))
    assert(got.isDefined, "key 10 must be present")
    val v = got.get
    assert(v.getAs[Long]("n") == 2L && v.getAs[Long]("cents") == 150L, s"got $v")
    // a key the query never saw
    assert(Rescale.pointRead(ss, ckpt, 99L, Some("totals")).isEmpty)
  }

  test("resume at a wider parallelism: keys redistribute and totals continue, not restart") {
    val old = sessionAt(2)
    val ckptOld = Files.createTempDirectory("graft_rsc_old").toString
    runTotals(old, evsA, ckptOld, None)

    val wide = sessionAt(5)
    val ckptNew = Files.createTempDirectory("graft_rsc_new").toString
    import wide.implicits._
    val seed = Rescale.savepointTotals(wide, ckptOld).collect().toSeq
    val resumed = runTotals(wide, evsB, ckptNew, Some(seed))
      .map(t => t.user_id -> ((t.n, t.cents))).toMap
    // user 10 CONTINUED from (2, 150): only restored state explains n=3
    assert(resumed == Map(10L -> ((3L, 275L)), 13L -> ((1L, 400L)), 14L -> ((1L, 500L))))

    // the new store physically spans MORE partitions than the old
    // count had available — with 5 seeded/fed keys over 5 partitions
    // vs 2 before, at least one key must sit at partition_id >= 2
    val newParts = Rescale.savepointTotalsWithPartition(wide, ckptNew)
      .select("partition_id").distinct().collect().map(_.getInt(0)).toSet
    assert(newParts.exists(_ >= 2), s"no key moved beyond the old layout: $newParts")
    // and the rescaled store still carries EVERY key ever seen (seeded
    // keys without phase-2 traffic included — state moved, not output)
    val newKeys = Rescale.savepointTotals(wide, ckptNew).collect().map(_.user_id).toSet
    assert(newKeys == Set(10L, 11L, 12L, 13L, 14L))
  }

  test("rescaled two-phase output equals the uninterrupted single run") {
    val old = sessionAt(3)
    val ckptOld = Files.createTempDirectory("graft_rsc_eq1").toString
    runTotals(old, evsA, ckptOld, None)
    val wide = sessionAt(7)
    import wide.implicits._
    val seed = Rescale.savepointTotals(wide, ckptOld).collect().toSeq
    val phase2 = runTotals(wide, evsB,
      Files.createTempDirectory("graft_rsc_eq2").toString, Some(seed))

    val single = sessionAt(4)
    val whole = runTotals(single, evsA ++ evsB,
      Files.createTempDirectory("graft_rsc_eq3").toString, None)
    // latest total per key, from each world
    def latest(rows: Seq[BootTotal]): Map[Long, (Long, Long)] =
      rows.groupBy(_.user_id).map { case (k, v) =>
        val m = v.maxBy(_.n); k -> ((m.n, m.cents)) }
    // phase-1 keys untouched in phase 2 keep their phase-1 totals
    val rescaled = latest(runOutputsPhase1(old) ++ phase2)
    assert(rescaled == latest(whole))
  }

  // phase-1 emissions for the equality test: re-derive from the seed
  // events (the memory sink of the first run lives in `old`'s session)
  private def runOutputsPhase1(ss: SparkSession): Seq[BootTotal] =
    evsA.groupBy(_.user_id).map { case (k, v) =>
      BootTotal(k, v.size.toLong,
        v.map(e => math.floor(e.value * 100).toLong).sum)
    }.toSeq

  test("second state shape: keep-last winners rescale and keep their tie semantics") {
    val old = sessionAt(2)
    val ckptOld = Files.createTempDirectory("graft_rsc_kl1").toString
    locally { // phase 1: winners land at 2 partitions
      implicit val sql = old.sqlContext
      import old.implicits._
      val ms = MemoryStream[Ev]
      val q = TwsOps.keepLastByUser(ms.toDS()).toDF()
        .writeStream.format("memory").queryName("t_klrsc1")
        .outputMode("update").option("checkpointLocation", ckptOld).start()
      try {
        ms.addData(Ev(1, 10, "a", 100, 1.0), Ev(2, 10, "b", 200, 1.0),
          Ev(3, 11, "a", 500, 1.0))
        q.processAllAvailable()
      } finally q.stop()
    }
    val wide = sessionAt(5)
    implicit val sql = wide.sqlContext
    import wide.implicits._
    val seed = Rescale.savepointKeepLast(wide, ckptOld)
    assert(seed.collect().map(e => e.user_id -> e.event_id).toMap ==
      Map(10L -> 2L, 11L -> 3L))
    val ms = MemoryStream[Ev]
    val q = Rescale.resumeKeepLast(ms.toDS(),
        wide.createDataset(seed.collect().toSeq)).toDF()
      .writeStream.format("memory").queryName("t_klrsc2")
      .outputMode("update")
      .option("checkpointLocation",
        Files.createTempDirectory("graft_rsc_kl2").toString)
      .start()
    try {
      // OLDER event for a seeded key: restored winner must hold (no
      // emission) — provable only if state crossed the rescale
      ms.addData(Ev(4, 10, "c", 150, 1.0))
      q.processAllAvailable()
      // strictly newer event displaces; fresh key emits
      ms.addData(Ev(5, 10, "d", 300, 1.0), Ev(6, 12, "a", 50, 1.0))
      q.processAllAvailable()
    } finally q.stop()
    val emitted = wide.table("t_klrsc2").as[Ev].collect().map(_.event_id).toSet
    assert(emitted == Set(5L, 6L), s"got $emitted")
  }
}
