package graft.streaming

import graft.SparkSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/**
 * Randomized properties for the round-4 operators, sampled with fixed
 * seeds (deterministic CI). The NFA matcher properties run pure
 * in-memory; the heavier ones pin invariants a single example can't.
 */
class StreamPropertySpec extends SparkSuite {

  private val evGen: Gen[Ev] = for {
    id <- Gen.choose(1L, 100000L)
    typ <- Gen.oneOf("a", "b", "c")
    ts <- Gen.choose(0L, 400L)
    v <- Gen.choose(0, 1000)
  } yield Ev(id, 1, typ, ts, v / 100.0)

  private def events(seed: Long, n: Int = 30): IndexedSeq[Ev] =
    Gen.listOfN(n, evGen)
      .apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(Nil)
      .distinctBy(_.event_id)
      .sortBy(e => (e.ts_us, e.event_id))
      .toIndexedSeq

  private val abPattern = Cep.Pattern
    .begin("a", _.event_type == "a")
    .followedBy("b", _.event_type == "b")
    .within(200L)

  test("property: SKIP_PAST_LAST matches never overlap and are a subset of NO_SKIP") {
    for (seed <- 1L to 8L) {
      val evs = events(seed)
      val all = Cep.matchSorted(evs, abPattern).map(_.event_ids).toSet
      val skips = Cep.matchSorted(evs, abPattern.afterMatchSkip(Cep.SkipPastLast))
      assert(skips.map(_.event_ids).forall(all.contains), s"seed=$seed: not a subset")
      // consecutive matches are disjoint in event-id AND time order
      skips.sliding(2).foreach {
        case List(m1, m2) =>
          assert(m1.end_us <= m2.start_us ||
            (m1.end_us == m2.start_us && m1.event_ids.last != m2.event_ids.head),
            s"seed=$seed overlap: $m1 vs $m2")
          assert(m1.event_ids.toSet.intersect(m2.event_ids.toSet).isEmpty,
            s"seed=$seed shared events: $m1 vs $m2")
        case _ => ()
      }
    }
  }

  test("property: reluctant oneOrMore finds a match whenever greedy does (consuming no more)") {
    val greedy = Cep.Pattern.begin("a", _.event_type == "a")
      .oneOrMoreNext("bs", _.event_type == "b")
    val reluctant = Cep.Pattern.begin("a", _.event_type == "a")
      .oneOrMoreNextReluctant("bs", _.event_type == "b")
    for (seed <- 20L to 27L) {
      val evs = events(seed)
      val g = Cep.matchSorted(evs, greedy).map(m => m.event_ids.head -> m.event_ids.size).toMap
      val r = Cep.matchSorted(evs, reluctant).map(m => m.event_ids.head -> m.event_ids.size).toMap
      assert(g.keySet == r.keySet, s"seed=$seed: different match starts")
      g.foreach { case (start, glen) =>
        assert(r(start) <= glen, s"seed=$seed: reluctant consumed more at $start")
      }
    }
  }

  test("property: bounded OVER single-release equals the in-memory sliding frame") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    for (seed <- 30L to 32L) {
      val evs = events(seed, n = 20)
      val ms = MemoryStream[Ev]
      val name = s"t_prop_bo_$seed"
      val q = BoundedOver.run(ms.toDS(), BoundedOver.RowsFrame(2)).toDF()
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        ms.addData(evs: _*)
        q.processAllAvailable()
        // flush: a far-future row on another key advances the watermark
        ms.addData(Ev(-1, -2, "x", 100000000L, 0.0))
        q.processAllAvailable()
        val got = spark.table(name).as[BoundedOverRow].collect()
          .filter(_.user_id == 1).map(r => r.event_id -> r.frame_cents).toMap
        val want = evs.zipWithIndex.map { case (e, i) =>
          val frame = evs.slice(math.max(0, i - 2), i + 1)
          e.event_id -> frame.map(x => math.floor(x.value * 100).toLong).sum
        }.toMap
        assert(got == want, s"seed=$seed")
      } finally q.stop()
    }
  }

  test("property: streaming countWindow equals the batch row_number partition") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    for (seed <- 40L to 42L) {
      val evs = events(seed, n = 23)
      val ms = MemoryStream[Ev]
      val name = s"t_prop_cw_$seed"
      val q = CountSession.countWindow(ms.toDS(), n = 4).toDF()
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        ms.addData(evs: _*)
        q.processAllAvailable()
        // two same-key sentinel rounds: round 1 advances the watermark,
        // round 2 invokes the (NoTimeout) key under the advanced mark
        ms.addData(Ev(-1, 1, "x", 100000000L, 0.0))
        q.processAllAvailable()
        ms.addData(Ev(-2, 1, "x", 200000000L, 0.0))
        q.processAllAvailable()
        val got = spark.table(name).as[CountWindowRow].collect()
          .map(r => r.win_idx -> (r.n_rows, r.win_cents)).toMap
        // batch truth: (ts, id)-ordered rows chunked by 4, full chunks only
        val want = evs.grouped(4).zipWithIndex
          .filter(_._1.size == 4)
          .map { case (chunk, i) =>
            (i + 1).toLong -> (4L, chunk.map(x => math.floor(x.value * 100).toLong).sum)
          }.toMap
        assert(got == want, s"seed=$seed: $got vs $want")
      } finally q.stop()
    }
  }

  test("property: streaming sessionDynamic equals the in-memory session merge") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val gapOf: Ev => Long = e => if (e.event_type == "a") 10L else 40L
    for (seed <- 50L to 52L) {
      val evs = events(seed, n = 23)
      val ms = MemoryStream[Ev]
      val name = s"t_prop_ds_$seed"
      val q = CountSession.sessionDynamic(ms.toDS(), gapOf).toDF()
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        ms.addData(evs: _*)
        q.processAllAvailable()
        ms.addData(Ev(-1, 1, "x", 100000000L, 0.0))
        q.processAllAvailable()
        ms.addData(Ev(-2, 1, "x", 200000000L, 0.0))
        q.processAllAvailable()
        val got = spark.table(name).as[DynSessionRow].collect()
          .filter(_.ws_us < 100000000L)
          .map(r => (r.ws_us, r.we_us, r.n, r.sum_cents)).toSet
        // in-memory truth: extend while ts < running max(ts + gap)
        var sessions = List.empty[(Long, Long, Long, Long)]
        evs.foreach { e =>
          val end = e.ts_us + gapOf(e)
          sessions = sessions match {
            case (ws, we, n, sum) :: rest if e.ts_us < we =>
              (ws, math.max(we, end), n + 1, sum + math.floor(e.value * 100).toLong) :: rest
            case rest => (e.ts_us, end, 1L, math.floor(e.value * 100).toLong) :: rest
          }
        }
        assert(got == sessions.toSet, s"seed=$seed: $got vs ${sessions.toSet}")
      } finally q.stop()
    }
  }

  test("property: the streaming timeout channel equals batch-derived timed-out starts") {
    // TimedOutPartialMatchHandler analog, randomized: for a 3-step
    // followedBy chain with disjoint predicates, the timed-out starts
    // must be EXACTLY the 'a' events bound in no full match, and each
    // partial's depth must be 2 iff a 'b' follows within the window
    // (earliest-match prefix) else 1. The batch side derives this with
    // plain set logic over the full-history matcher — independent of
    // the streaming eviction/probe machinery it checks.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val W = 5L * 1000000 // 5 s within (second-scale ts so the wm moves)
    val pat = Cep.Pattern.begin("a", (_: Ev).event_type == "a")
      .followedBy("b", _.event_type == "b")
      .followedBy("c", _.event_type == "c")
      .within(W)
    for (seed <- 60L to 62L) {
      val rnd = new scala.util.Random(seed)
      val events = (1 to 50).map(i =>
        Ev(i.toLong, 1L + rnd.nextInt(2), Seq("a", "b", "c", "x")(rnd.nextInt(4)),
          i * 1000000L, 1.0))
      val sentinels = List(1L, 2L).flatMap(u => List(
        Ev(900 + u, u, "z", 100000L * 1000000, 0.0),
        Ev(910 + u, u, "z", 200000L * 1000000, 0.0)))
      val want = events.groupBy(_.user_id).toList.flatMap { case (u, evs0) =>
        val evs = evs0.sortBy(e => (e.ts_us, e.event_id)).toIndexedSeq
        val matched = Cep.matchSorted(evs, pat).flatMap(_.event_ids).toSet
        evs.filter(e => e.event_type == "a" && !matched(e.event_id)).map { e =>
          val hasB = evs.exists(x => x.event_type == "b" &&
            x.ts_us > e.ts_us && x.ts_us - e.ts_us <= W)
          (u, e.event_id, if (hasB) 2 else 1)
        }
      }.toSet
      val ms = MemoryStream[Ev]
      val name = StreamOps.freshName("cep_tmo")
      val q = Cep.runBoundBy(ms.toDS(), pat, "user_id", "ts_us", "event_id",
          watermarkDelay = "0 seconds", timedOut = true).toDF()
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        var i = 0
        while (i < events.length) { // ts-ordered, random batch sizes
          val n = 1 + rnd.nextInt(7)
          ms.addData(events.slice(i, i + n): _*)
          q.processAllAvailable()
          i += n
        }
        sentinels.grouped(2).toList.transpose.foreach { round =>
          ms.addData(round: _*)
          q.processAllAvailable()
        }
        val got = spark.table(name)
          .where(col("binds").getItem(0).getField("step").startsWith(Cep.TimedOutStep))
          .selectExpr("binds[0].ev.user_id AS u", "binds[0].ev.event_id AS s",
            "size(binds) AS k")
          .as[(Long, Long, Int)].collect().toSet
        assert(got == want,
          s"seed=$seed\nmissing=${want -- got}\nextra=${got -- want}")
      } finally q.stop()
    }
  }

  test("property: streaming CEP equals the batch matcher under random micro-batch splits") {
    // Patterns whose FINAL step is mandatory with a predicate disjoint
    // from the preceding quantifier's: a match is complete only when
    // its true last event arrives, so the per-batch re-evaluation must
    // reproduce the full-history matcher EXACTLY — this pins the
    // cross-batch buffering, watermark eviction timing (an event
    // needed by a future match must never evict early), and the
    // once-only dedup markers. (Patterns with a quantified/optional
    // TAIL are excluded by design: the engine emits the preferred
    // match as of the completing batch and does not re-emit when a
    // later batch would have extended it — documented subset.)
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val W = 2000L // within horizon (us)
    val patterns: List[(String, Cep.Pattern[Ev])] = List(
      "next" -> Cep.Pattern.begin("a", _.event_type == "a")
        .next("b", _.event_type == "b").within(W),
      "followedBy_skip" -> Cep.Pattern.begin("a", _.event_type == "a")
        .followedBy("b", _.event_type == "b").within(W)
        .afterMatchSkip(Cep.SkipPastLast),
      // all-Once chains take the INCREMENTAL matcher (open runs resume
      // over each batch's new events instead of re-scanning the
      // buffer) — these three pin its parity across strict/relaxed
      // mixes, skip-to-bound floors, and per-step gaps
      "mixed_chain_incremental" -> Cep.Pattern.begin("a", _.event_type == "a")
        .followedBy("b", _.event_type == "b")
        .next("c", _.event_type == "c").within(W),
      "skip_to_first_incremental" -> Cep.Pattern.begin("a", _.event_type == "a")
        .followedBy("b", _.event_type == "b")
        .followedBy("c", _.event_type == "c").within(W)
        .afterMatchSkip(Cep.SkipToFirst("b")),
      "step_gap_incremental" -> Cep.Pattern.begin("a", _.event_type == "a")
        .followedBy("b", _.event_type == "b").within(W)
        .withinStep(300L),
      "plus_tail" -> Cep.Pattern.begin("a", _.event_type == "a")
        .oneOrMoreNext("bs", _.event_type == "b")
        .next("c", _.event_type == "c").within(W),
      // STRICT v{1,3}: the optional reps are pinned by adjacency, so
      // in-order arrival can never grow an emitted match's run. (The
      // fluent relaxed timesRange is excluded by design: a relaxed run
      // can extend AFTER a completion emits, and the engine's
      // per-start dedup keeps the first completion — documented.)
      "strict_range_tail" -> Cep.Pattern.begin("a", _.event_type == "a")
        .next("v#1", _.event_type == "b")
        .stepIter("v#2", (e, _) => e.event_type == "b", strict = true, Cep.Optional)
        .stepIter("v#3", (e, _) => e.event_type == "b", strict = true, Cep.Optional)
        .followedBy("c", _.event_type == "c").within(W)
        .afterMatchSkip(Cep.SkipPastLast),
      // COMBINATIONS loop with a mandatory distinct tail: every
      // branch (an in-order sub-sequence of b's) completes at its own
      // c, and later arrivals only ADD branches — the per-batch
      // re-scan must reproduce every branch exactly once across
      // splits, which exercises the full-binds dedup signature (not
      // the per-start one).
      "combinations_tail" -> Cep.Pattern.begin("a", _.event_type == "a")
        .oneOrMore("bs", _.event_type == "b")
        .allowCombinations()
        .followedBy("c", _.event_type == "c").within(W),
      // QUANTIFIED INCREMENTAL patterns (round 15): one loop step with
      // a mandatory disjoint tail takes the incremental matcher's
      // loop handling — reluctant relaxed oneOrMore via first-closing
      // dominance, strict greedy via the single extender. Disjoint
      // predicates make the preferred binding split-invariant, so the
      // random-split stream must equal the batch matcher exactly.
      "relaxed_plus_tail_incremental" -> Cep.Pattern.begin("a", _.event_type == "a")
        .oneOrMore("bs", _.event_type == "b")
        .followedBy("c", _.event_type == "c").within(W),
      "relaxed_plus_tail_skip_incremental" -> Cep.Pattern.begin("a", _.event_type == "a")
        .oneOrMore("bs", _.event_type == "b")
        .followedBy("c", _.event_type == "c").within(W)
        .afterMatchSkip(Cep.SkipPastLast),
      "zstar_strict_tail_incremental" -> Cep.Pattern.begin("a", _.event_type == "a")
        .zeroOrMoreNext("bs", _.event_type == "b")
        .followedBy("c", _.event_type == "c").within(W),
      "times_or_more_incremental" -> Cep.Pattern.begin("a", _.event_type == "a")
        .timesOrMore("bs", _.event_type == "b", 2)
        .followedBy("c", _.event_type == "c").within(W),
      // RELAXED timesRange WITH emitOnHorizon(): matches hold until
      // the watermark closes the start's within window, so the
      // emitted preference is computed over the complete horizon —
      // exact batch parity even for growable relaxed runs.
      "relaxed_range_hold" -> Cep.Pattern.begin("a", _.event_type == "a")
        .timesRange("v", _.event_type == "b", min = 1, max = 3)
        .followedBy("c", _.event_type == "c").within(W)
        .afterMatchSkip(Cep.SkipPastLast)
        .emitOnHorizon())
    for (seed <- 40L to 41L; (pname, pat) <- patterns) {
      val rnd = new scala.util.Random(seed * 1009 + pname.hashCode)
      val events = (1 to 60).map(i =>
        Ev(i.toLong, 1L + rnd.nextInt(2), Seq("a", "b", "c")(rnd.nextInt(3)), i * 100L, 1.0))
      // two far-future sentinel rounds per key ('z' matches no DEFINE):
      // round 1 advances the watermark past every start's horizon,
      // round 2 invokes the keys under it so HELD matches flush
      val sentinels = List(1L, 2L).flatMap(u => List(
        Ev(900 + u, u, "z", 100000L * 1000000, 0.0),
        Ev(910 + u, u, "z", 200000L * 1000000, 0.0)))
      val want = (events ++ sentinels).groupBy(_.user_id).toList.flatMap { case (u, evs) =>
        Cep.matchSorted(evs.sortBy(e => (e.ts_us, e.event_id)).toIndexedSeq, pat)
          .map(m => (u, m.event_ids))
      }.toSet
      val ms = MemoryStream[Ev]
      val name = StreamOps.freshName("cep_diff")
      val q = Cep.run(ms.toDS(), pat, "0 seconds").toDF()
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        var i = 0
        while (i < events.length) { // ts-ordered, random batch sizes
          val n = 1 + rnd.nextInt(7)
          ms.addData(events.slice(i, i + n): _*)
          q.processAllAvailable()
          i += n
        }
        sentinels.grouped(2).toList.transpose.foreach { round =>
          ms.addData(round: _*)
          q.processAllAvailable()
        }
        val got = spark.table(name).as[CepMatch].collect()
          .map(m => (m.user_id, m.event_ids)).toSet
        assert(got == want,
          s"seed=$seed pattern=$pname\nstreaming=$got\nbatch=$want\n" +
            s"missing=${want -- got} extra=${got -- want}")
      } finally q.stop()
    }
  }
}
