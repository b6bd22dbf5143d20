package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** NFA semantics (pure) + streaming behavior (match across micro-batch
 * boundary, exactly-once emission) of the CEP operator. */
class CepSpec extends SparkSuite {

  private def ev(id: Long, typ: String, tsUs: Long, user: Long = 1) =
    Ev(id, user, typ, tsUs, 1.0)

  private val clickThenBuy = Cep.Pattern
    .begin("click", _.event_type == "click")
    .next("buy", _.event_type == "purchase")
    .within(600L * 1000000)

  test("next requires strict adjacency") {
    val events = IndexedSeq(
      ev(1, "click", 0), ev(2, "view", 10), ev(3, "purchase", 20),
      ev(4, "click", 30), ev(5, "purchase", 40))
    val ms = Cep.matchSorted(events, clickThenBuy)
    assert(ms.map(_.event_ids) == List(Seq(4L, 5L))) // 1→3 blocked by the view
  }

  test("followedBy allows gaps and takes the earliest qualifying event") {
    val p = Cep.Pattern.begin("click", _.event_type == "click")
      .followedBy("buy", _.event_type == "purchase")
      .within(600L * 1000000)
    val events = IndexedSeq(
      ev(1, "click", 0), ev(2, "view", 10), ev(3, "purchase", 20), ev(4, "purchase", 30))
    assert(Cep.matchSorted(events, p).map(_.event_ids) == List(Seq(1L, 3L)))
  }

  test("within bound excludes too-late completions") {
    val p = Cep.Pattern.begin("click", _.event_type == "click")
      .followedBy("buy", _.event_type == "purchase")
      .within(15)
    val events = IndexedSeq(ev(1, "click", 0), ev(2, "purchase", 20))
    assert(Cep.matchSorted(events, p).isEmpty)
  }

  test("every qualifying start begins its own match (NO_SKIP)") {
    val p = Cep.Pattern.begin("a", _.event_type == "click")
      .followedBy("b", _.event_type == "purchase")
    val events = IndexedSeq(ev(1, "click", 0), ev(2, "click", 5), ev(3, "purchase", 9))
    assert(Cep.matchSorted(events, p).map(_.event_ids).toSet ==
      Set(Seq(1L, 3L), Seq(2L, 3L)))
  }

  test("times(n) expands to n relaxed occurrences") {
    val p = Cep.Pattern.begin("click", _.event_type == "click")
      .times("buy", _.event_type == "purchase", 2)
    val events = IndexedSeq(
      ev(1, "click", 0), ev(2, "view", 5), ev(3, "purchase", 10),
      ev(4, "view", 15), ev(5, "purchase", 20))
    assert(Cep.matchSorted(events, p).map(_.event_ids) == List(Seq(1L, 3L, 5L)))
  }

  test("optional: greedy include-first, skipped when absent") {
    val p = Cep.Pattern.begin("click", _.event_type == "click")
      .optional("view", _.event_type == "view")
      .followedBy("buy", _.event_type == "purchase")
    val withView = IndexedSeq(ev(1, "click", 0), ev(2, "view", 5), ev(3, "purchase", 10))
    assert(Cep.matchSorted(withView, p).map(_.event_ids) == List(Seq(1L, 2L, 3L)))
    val withoutView = IndexedSeq(ev(1, "click", 0), ev(3, "purchase", 10))
    assert(Cep.matchSorted(withoutView, p).map(_.event_ids) == List(Seq(1L, 3L)))
    // optional consumed the view AFTER the purchase? no — include fails
    // downstream (no purchase after the view), so it falls back to skip
    val viewAfter = IndexedSeq(ev(1, "click", 0), ev(3, "purchase", 10), ev(2, "view", 15))
    assert(Cep.matchSorted(viewAfter, p).map(_.event_ids) == List(Seq(1L, 3L)))
  }

  test("oneOrMoreNext consumes the maximal consecutive run") {
    val p = Cep.Pattern.begin("click", _.event_type == "click")
      .oneOrMoreNext("buys", _.event_type == "purchase")
      .followedBy("view", _.event_type == "view")
    val events = IndexedSeq(
      ev(1, "click", 0), ev(2, "purchase", 5), ev(3, "purchase", 10),
      ev(4, "view", 15))
    assert(Cep.matchSorted(events, p).map(_.event_ids) == List(Seq(1L, 2L, 3L, 4L)))
    // zero purchases → no match
    val none = IndexedSeq(ev(1, "click", 0), ev(4, "view", 15))
    assert(Cep.matchSorted(none, p).isEmpty)
  }

  test("notNext: negative lookahead blocks the match without consuming") {
    val p = Cep.Pattern.begin("click", _.event_type == "click")
      .notNext("no_view", _.event_type == "view")
      .followedBy("buy", _.event_type == "purchase")
      .within(60L * 1000000L) // negative steps require a within horizon
    val blocked = IndexedSeq(ev(1, "click", 0), ev(2, "view", 5), ev(3, "purchase", 10))
    assert(Cep.matchSorted(blocked, p).isEmpty)
    val ok = IndexedSeq(ev(1, "click", 0), ev(4, "other", 5), ev(3, "purchase", 10))
    assert(Cep.matchSorted(ok, p).map(_.event_ids) == List(Seq(1L, 3L)))
  }

  // The reference's documented skip-strategy example
  // (nfa/aftermatch/AfterMatchSkipStrategy.java family): pattern b+ c
  // over b1 b2 b3 c, matched with strict-contiguity oneOrMore.
  private val bPlusC = Cep.Pattern
    .begin("b", _.event_type == "b")
    .oneOrMoreNext("b", _.event_type == "b")
    .next("c", _.event_type == "c")
  private val bRun = IndexedSeq(
    ev(1, "b", 0), ev(2, "b", 10), ev(3, "b", 20), ev(4, "c", 30))
  // begin("b") consumes the first b; oneOrMoreNext("b") the rest — so
  // starts at b1/b2 match, b3 alone cannot feed the oneOrMore
  private def matchesWith(s: Cep.AfterMatch) =
    Cep.matchSorted(bRun, bPlusC.afterMatchSkip(s)).map(_.event_ids)

  test("NO_SKIP / SKIP_TO_NEXT: every qualifying start matches (overlaps allowed)") {
    val expected = List(Seq(1L, 2L, 3L, 4L), Seq(2L, 3L, 4L))
    assert(matchesWith(Cep.NoSkip) == expected)
    assert(matchesWith(Cep.SkipToNext) == expected)
  }

  test("SKIP_PAST_LAST_EVENT: non-overlapping — resume after the match end") {
    assert(matchesWith(Cep.SkipPastLast) == List(Seq(1L, 2L, 3L, 4L)))
  }

  test("SKIP_TO_FIRST[step]: resume at the first event bound to the step (never stalls)") {
    // first "b" of the current match IS the start → advances by one:
    // identical to NO_SKIP, per the reference's documented example
    assert(matchesWith(Cep.SkipToFirst("b")) ==
      List(Seq(1L, 2L, 3L, 4L), Seq(2L, 3L, 4L)))
    // skipping to the first "c" jumps past the overlapping start at b2
    assert(matchesWith(Cep.SkipToFirst("c")) == List(Seq(1L, 2L, 3L, 4L)))
  }

  test("SKIP_TO_LAST[step]: resume at the last event bound to the step") {
    // last "b" of match 1 is b3, which cannot start a new match (no
    // second b for the oneOrMore) → only the first match survives
    assert(matchesWith(Cep.SkipToLast("b")) == List(Seq(1L, 2L, 3L, 4L)))
  }

  test("reluctant oneOrMore consumes minimally; greedy backtracks to free the tail") {
    val greedy = Cep.Pattern.begin("a", _.event_type == "a")
      .oneOrMoreNext("bs", _.event_type == "b")
      .next("end", _.event_type == "b")
    val reluctant = Cep.Pattern.begin("a", _.event_type == "a")
      .oneOrMoreNextReluctant("bs", _.event_type == "b")
      .next("end", _.event_type == "b")
    // greedy prefers the longest `bs` run that still lets `end` bind
    // (regex `+` semantics — the reference NFA branches take/proceed,
    // so `a b+ b` on [a b b] matches rather than starving `end`)
    val events = IndexedSeq(ev(1, "a", 0), ev(2, "b", 10), ev(3, "b", 20))
    assert(Cep.matchSorted(events, greedy).map(_.event_ids) ==
      List(Seq(1L, 2L, 3L)))
    // reluctant stops after b1, so `end` takes b2
    assert(Cep.matchSorted(events, reluctant).map(_.event_ids) ==
      List(Seq(1L, 2L, 3L)))
    // with a longer run the preference is visible in how many rows
    // `bs` binds: greedy backtracks only one rep, reluctant takes one
    val events4 = IndexedSeq(ev(1, "a", 0), ev(2, "b", 10), ev(3, "b", 20), ev(4, "b", 30))
    assert(Cep.matchSortedBound(events4, greedy.afterMatchSkip(Cep.SkipPastLast))
      .map(_.binds.map(b => (b.step, b.ev.event_id))) ==
      List(List(("a", 1L), ("bs", 2L), ("bs", 3L), ("end", 4L))))
    assert(Cep.matchSortedBound(events4, reluctant.afterMatchSkip(Cep.SkipPastLast))
      .map(_.binds.map(b => (b.step, b.ev.event_id))) ==
      List(List(("a", 1L), ("bs", 2L), ("end", 3L))))
  }

  test("reluctant optional excluded when the rest can match without it") {
    val greedyOpt = Cep.Pattern.begin("a", _.event_type == "a")
      .optional("x", _.event_type == "b")
      .followedBy("y", _.event_type == "b")
    val reluctantOpt = Cep.Pattern.begin("a", _.event_type == "a")
      .optionalReluctant("x", _.event_type == "b")
      .followedBy("y", _.event_type == "b")
    val events = IndexedSeq(ev(1, "a", 0), ev(2, "b", 10), ev(3, "b", 20))
    assert(Cep.matchSorted(events, greedyOpt).map(_.event_ids) == List(Seq(1L, 2L, 3L)))
    assert(Cep.matchSorted(events, reluctantOpt).map(_.event_ids) == List(Seq(1L, 2L)))
  }

  test("watermark eviction keeps CEP state bounded by the pattern horizon") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, size}
    val ms = MemoryStream[Ev]
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cep_evict").toString
    // within = 600s, watermark delay 1s: after each hourly batch the
    // previous hour's events fall past watermark - within and are evicted
    val q = Cep.run(ms.toDS(), clickThenBuy, "1 second").toDF()
      .writeStream.format("memory").queryName("t_cep_evict").outputMode("append")
      .option("checkpointLocation", ckpt).start()
    try {
      val hourUs = 3600L * 1000000
      (0 until 6).foreach { b =>
        ms.addData(ev(b * 10 + 1, "click", b * hourUs),
          ev(b * 10 + 2, "purchase", b * hourUs + 1000000))
        q.processAllAvailable()
      }
      assert(spark.table("t_cep_evict").count() == 6) // one match per batch
      // 12 events ingested; retained state holds at most the last two
      // batches (watermark lags one batch), never the full history
      val bufSizes = spark.read.format("statestore").load(ckpt)
        .select(size(col("value.groupState.buffer"))).as[Int].collect()
      assert(bufSizes.nonEmpty && bufSizes.forall(_ <= 4),
        s"CEP buffer not watermark-bounded: ${bufSizes.toList}")
      val emittedSizes = spark.read.format("statestore").load(ckpt)
        .select(size(col("value.groupState.emitted"))).as[Int].collect()
      assert(emittedSizes.forall(_ <= 2),
        s"emitted-match markers not pruned: ${emittedSizes.toList}")
    } finally q.stop()
  }

  test("streaming: eviction cannot resurrect a skip-shadowed start (floor regression)") {
    // SKIP PAST LAST: a@0, a@10, b@20 → the a@0 match consumes b@20 and
    // shadows a@10. After the a@0 row EVICTS (watermark - within passes
    // it) while b@20 survives, a re-scan without the floor would bind
    // the shadowed [a@10, b@20] as a fresh start. The persisted floor
    // (trim to last consumed) must suppress it — and must ALSO deny the
    // shadowed match's own skip side-effects, which would otherwise
    // shadow LEGITIMATE later starts (second observed defect).
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val p = Cep.Pattern.begin("a", _.event_type == "a")
      .followedBy("b", _.event_type == "b")
      .within(50).afterMatchSkip(Cep.SkipPastLast)
    val ms = MemoryStream[Ev]
    val q = Cep.run(ms.toDS(), p, "0 seconds").toDF()
      .writeStream.format("memory").queryName("t_cep_floor")
      .outputMode("append").start()
    try {
      ms.addData(ev(1, "a", 0), ev(2, "a", 10), ev(3, "b", 20))
      q.processAllAvailable() // wm 0: nothing released? matches emit immediately: [1,3]
      // advance the watermark far enough to evict a@0 (wm - within > 0)
      // while later rows survive, then offer a NEW legitimate match
      ms.addData(ev(4, "x", 80))
      q.processAllAvailable() // wm 20: a@0 at the horizon boundary
      ms.addData(ev(5, "a", 140), ev(6, "b", 150))
      q.processAllAvailable() // wm 80: a@0/a@10/b@20 evicted
      ms.addData(ev(7, "x", 260))
      q.processAllAvailable()
      val got = spark.table("t_cep_floor").as[CepMatch].collect()
        .map(_.event_ids).toList
      // exactly [1,3] (the preferred match) and [5,6] (legitimately
      // after the floor); the shadowed [2,3] must never surface
      assert(got.sortBy(_.head) == List(Seq(1L, 3L), Seq(5L, 6L)), s"got $got")
    } finally q.stop()
  }

  test("streaming: a match straddling a micro-batch boundary is found exactly once") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Ev]
    val q = Cep.run(ms.toDS(), clickThenBuy).toDF()
      .writeStream.format("memory").queryName("t_cep").outputMode("append").start()
    try {
      ms.addData(ev(1, "click", 0))
      q.processAllAvailable()
      ms.addData(ev(2, "purchase", 10)) // completes the match started in batch 1
      q.processAllAvailable()
      ms.addData(ev(3, "view", 20))     // no new match; nothing re-emitted
      q.processAllAvailable()
      val got = spark.table("t_cep").as[CepMatch].collect()
      assert(got.map(_.event_ids).toSeq == Seq(Seq(1L, 2L)))
    } finally q.stop()
  }

  test("timesRange(min, max): greedy up to max, matches with only min when short") {
    val p = Cep.Pattern.begin("click", _.event_type == "click")
      .timesRange("v", _.event_type == "view", min = 1, max = 3)
      .followedBy("buy", _.event_type == "purchase")
      .within(600L * 1000000)
    // three views available: greedy consumes all three
    val evs3 = IndexedSeq(
      ev(1, "click", 0), ev(2, "view", 10), ev(3, "view", 20),
      ev(4, "view", 30), ev(5, "purchase", 40))
    assert(Cep.matchSorted(evs3, p).map(_.event_ids) == List(Seq(1L, 2L, 3L, 4L, 5L)))
    // one view: min satisfied, optionals skipped
    val evs1 = IndexedSeq(
      ev(1, "click", 0), ev(2, "view", 10), ev(3, "purchase", 20))
    assert(Cep.matchSorted(evs1, p).map(_.event_ids) == List(Seq(1L, 2L, 3L)))
    // zero views: below min, no match from the click
    val evs0 = IndexedSeq(ev(1, "click", 0), ev(2, "purchase", 10))
    assert(Cep.matchSorted(evs0, p).isEmpty)
  }

  test("oneOrMore (relaxed, reluctant): repetitions skip gaps, consume minimally") {
    val p = Cep.Pattern.begin("click", _.event_type == "click")
      .oneOrMore("v", _.event_type == "view")
      .next("buy", _.event_type == "purchase")
      .within(600L * 1000000)
    // views separated by non-matching events; purchase requires strict
    // adjacency after the run, so the run must extend across the gaps
    val evs = IndexedSeq(
      ev(1, "click", 0), ev(2, "view", 10), ev(3, "other", 20),
      ev(4, "view", 30), ev(5, "purchase", 40))
    // reluctant: try [2] first — next after idx(2) is 'other', fails;
    // extend relaxed past the gap to [2,4] — next is purchase: match
    assert(Cep.matchSorted(evs, p).map(_.event_ids) == List(Seq(1L, 2L, 4L, 5L)))
    // strict-contiguity oneOrMoreNext cannot bridge the gap
    val strict = Cep.Pattern.begin("click", _.event_type == "click")
      .oneOrMoreNext("v", _.event_type == "view")
      .next("buy", _.event_type == "purchase")
      .within(600L * 1000000)
    assert(Cep.matchSorted(evs, strict).isEmpty)
  }

  test("streaming: a late event changing the preferred binding does not re-emit the match") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val p = Cep.Pattern.begin("click", _.event_type == "click")
      .followedBy("buy", _.event_type == "purchase")
      .within(600L * 1000000)
    val ms = MemoryStream[Ev]
    val q = Cep.run(ms.toDS(), p).toDF() // 1h delay admits the late row
      .writeStream.format("memory").queryName("t_cep_rebind").outputMode("append").start()
    try {
      ms.addData(ev(1, "click", 0), ev(5, "purchase", 300L * 1000000))
      q.processAllAvailable()
      assert(spark.table("t_cep_rebind").count() == 1) // match (1, 5)
      // late purchase BEFORE the emitted one: the matcher now prefers
      // (1, 3), but the start already emitted — no duplicate
      ms.addData(ev(3, "purchase", 120L * 1000000))
      q.processAllAvailable()
      val got = spark.table("t_cep_rebind").as[CepMatch].collect()
      assert(got.map(_.event_ids).toSeq == Seq(Seq(1L, 5L)),
        s"late rebind duplicated or replaced the match: ${got.toList}")
    } finally q.stop()
  }

  test("followedByAny: every qualifying later event is its own branch") {
    val p = Cep.Pattern.begin("click", _.event_type == "click")
      .followedByAny("buy", _.event_type == "purchase")
      .within(600L * 1000000)
    val events = IndexedSeq(
      ev(1, "click", 0), ev(2, "view", 10), ev(3, "purchase", 20),
      ev(4, "purchase", 30), ev(5, "click", 40), ev(6, "purchase", 50))
    // click 1 pairs with EVERY later purchase; click 5 with purchase 6
    assert(Cep.matchSorted(events, p).map(_.event_ids).toSet ==
      Set(Seq(1L, 3L), Seq(1L, 4L), Seq(1L, 6L), Seq(5L, 6L)))
    // plain followedBy keeps only the earliest branch
    val first = Cep.Pattern.begin("click", _.event_type == "click")
      .followedBy("buy", _.event_type == "purchase").within(600L * 1000000)
    assert(Cep.matchSorted(events, first).map(_.event_ids) ==
      List(Seq(1L, 3L), Seq(5L, 6L)))
  }

  test("notFollowedBy blocks when a forbidden event sits in the gap") {
    val p = Cep.Pattern.begin("click", _.event_type == "click")
      .notFollowedBy("no_err", _.event_type == "error")
      .followedBy("buy", _.event_type == "purchase")
      .within(600L * 1000000)
    val events = IndexedSeq(
      ev(1, "click", 0), ev(2, "error", 10), ev(3, "purchase", 20),
      ev(4, "click", 30), ev(5, "view", 40), ev(6, "purchase", 50))
    // click 1 → purchase 3 blocked by the error between; click 4 fine
    assert(Cep.matchSorted(events, p).map(_.event_ids) == List(Seq(4L, 6L)))
  }

  test("mid-pattern notFollowedBy also requires within (emission hold needs a horizon)") {
    val midNoWithin = Cep.Pattern.begin("click", _.event_type == "click")
      .notFollowedBy("no_err", _.event_type == "error")
      .followedBy("buy", _.event_type == "purchase")
    assertThrows[IllegalArgumentException] {
      Cep.matchSorted(IndexedSeq(ev(1, "click", 0)), midNoWithin)
    }
  }

  test("notFollowedBy at pattern end requires within; absence over the window") {
    val noWithin = Cep.Pattern.begin("click", _.event_type == "click")
      .notFollowedBy("no_buy", _.event_type == "purchase")
    assertThrows[IllegalArgumentException] {
      Cep.matchSorted(IndexedSeq(ev(1, "click", 0)), noWithin)
    }
    val p = noWithin.within(100)
    val events = IndexedSeq(
      ev(1, "click", 0), ev(2, "purchase", 50), // click 1: buy inside window
      ev(3, "click", 200), ev(4, "view", 250))  // click 3: no buy
    assert(Cep.matchSorted(events, p).map(_.event_ids) == List(Seq(3L)))
  }

  test("until(): a relaxed loop stops accepting repetitions at the stop row") {
    // without until, the relaxed run extends past `stop` to view 5 and
    // the strict next(buy) matches after it
    def mk(withUntil: Boolean) = {
      val loop = Cep.Pattern.begin("a", _.event_type == "a")
        .oneOrMore("v", _.event_type == "view")
      (if (withUntil) loop.until(_.event_type == "stop") else loop)
        .next("buy", _.event_type == "purchase")
    }
    val events = IndexedSeq(
      ev(1, "a", 0), ev(2, "view", 10), ev(3, "view", 20),
      ev(4, "stop", 30), ev(5, "view", 40), ev(6, "purchase", 50))
    assert(Cep.matchSorted(events, mk(withUntil = false)).map(_.event_ids) ==
      List(Seq(1L, 2L, 3L, 5L, 6L)))
    // with until(stop): the scan reaches the stop row before view 5,
    // the loop ends (stop row unconsumed), and no alternative reaches
    // the purchase adjacently — no match
    assert(Cep.matchSorted(events, mk(withUntil = true)).isEmpty)
  }

  test("until(): stop row before the first repetition fails the loop (>= 1 unmet)") {
    val p = Cep.Pattern.begin("a", _.event_type == "a")
      .oneOrMore("v", _.event_type == "view")
      .until(_.event_type == "stop")
      .followedBy("buy", _.event_type == "purchase")
    val events = IndexedSeq(
      ev(1, "a", 0), ev(2, "stop", 10), ev(3, "view", 20), ev(4, "purchase", 30))
    assert(Cep.matchSorted(events, p).isEmpty)
  }

  test("until(): a greedy strict run stops at a stop row that also satisfies pred") {
    def ev2(id: Long, typ: String, tsUs: Long, v: Double) = Ev(id, 1, typ, tsUs, v)
    val p = Cep.Pattern.begin("a", _.event_type == "a")
      .oneOrMoreNext("v", _.event_type == "view")
      .followedBy("buy", _.event_type == "purchase")
    val events = IndexedSeq(
      ev2(1, "a", 0, 0), ev2(2, "view", 10, 1), ev2(3, "view", 20, 2),
      ev2(4, "view", 30, 9), ev2(5, "view", 40, 3), ev2(6, "purchase", 50, 0))
    // unbounded greedy run swallows all four views
    assert(Cep.matchSorted(events, p).map(_.event_ids) ==
      List(Seq(1L, 2L, 3L, 4L, 5L, 6L)))
    // until(value > 5): run stops BEFORE view 4 (stop wins over pred)
    assert(Cep.matchSorted(events, p.copy(steps =
        p.steps.updated(1, p.steps(1).copy(until =
          Some((e: Ev, _: Cep.MatchCtx[Ev]) => e.value > 5))))).map(_.event_ids) ==
      List(Seq(1L, 2L, 3L, 6L)))
  }

  test("iterative condition: followedByIter reads earlier bindings via ctx.eventsFor") {
    def ev2(id: Long, typ: String, tsUs: Long, v: Double) = Ev(id, 1, typ, tsUs, v)
    val p = Cep.Pattern.begin("a", _.event_type == "a")
      .followedByIter("b", (e, ctx) =>
        e.event_type == "b" && e.value > ctx.eventsFor("a").head.value)
    val events = IndexedSeq(
      ev2(1, "a", 0, 5.0), ev2(2, "b", 10, 3.0), ev2(3, "b", 20, 7.0))
    // b with value 3 fails the iterative compare; the 7.0 one binds
    assert(Cep.matchSorted(events, p).map(_.event_ids) == List(Seq(1L, 3L)))
  }

  test("iterative condition: oneOrMoreIter sees its own consumed repetitions") {
    def ev2(id: Long, typ: String, tsUs: Long, v: Double) = Ev(id, 1, typ, tsUs, v)
    // strictly-increasing run: each repetition must exceed the last one
    val p = Cep.Pattern.begin("a", _.event_type == "a")
      .oneOrMoreIter("inc", (e, ctx) =>
        e.event_type == "v" &&
          ctx.eventsFor("inc").lastOption.forall(_.value < e.value))
      .followedBy("end", _.event_type == "end")
    val events = IndexedSeq(
      ev2(1, "a", 0, 0), ev2(2, "v", 10, 2.0), ev2(3, "v", 20, 1.0),
      ev2(4, "v", 30, 5.0), ev2(5, "end", 40, 0))
    // reluctant minimal first: [2] then end matches → binds (2);
    // v=1 would have been rejected by the increasing constraint
    assert(Cep.matchSorted(events, p).map(_.event_ids) == List(Seq(1L, 2L, 5L)))
  }

  test("iterative condition: ctx.prev navigates the physical time-ordered stream") {
    // b binds only when the row physically before it is an 'x'
    val p = Cep.Pattern.begin("a", _.event_type == "a")
      .followedByIter("b", (e, ctx) =>
        e.event_type == "b" && ctx.prev(1).exists(_.event_type == "x"))
    val events = IndexedSeq(
      ev(1, "a", 0), ev(2, "b", 10), ev(3, "x", 20), ev(4, "b", 30))
    assert(Cep.matchSorted(events, p).map(_.event_ids) == List(Seq(1L, 4L)))
  }

  test("group splicing: followedByGroup/nextGroup equal the hand-spliced pattern") {
    val group = Cep.Pattern.of[Ev]("g1", _.event_type == "view")
      .next("g2", _.event_type == "purchase")
    val spliced = Cep.Pattern.begin("a", _.event_type == "a").followedByGroup(group)
    val manual = Cep.Pattern.begin("a", _.event_type == "a")
      .followedBy("g1", _.event_type == "view")
      .next("g2", _.event_type == "purchase")
    val events = IndexedSeq(
      ev(1, "a", 0), ev(2, "other", 10), ev(3, "view", 20), ev(4, "purchase", 30))
    assert(Cep.matchSorted(events, spliced).map(_.event_ids) ==
      Cep.matchSorted(events, manual).map(_.event_ids))
    assert(Cep.matchSorted(events, spliced).map(_.event_ids) == List(Seq(1L, 3L, 4L)))
    // nextGroup: strict head — the gap event blocks it
    val strict = Cep.Pattern.begin("a", _.event_type == "a").nextGroup(group)
    assert(Cep.matchSorted(events, strict).isEmpty)
  }

  test("timesGroup repeats a group with addressable #k step names") {
    val group = Cep.Pattern.of[Ev]("v", _.event_type == "view")
      .next("p", _.event_type == "purchase")
    val p = Cep.Pattern.begin("a", _.event_type == "a").timesGroup(group, 2)
    val events = IndexedSeq(
      ev(1, "a", 0), ev(2, "view", 10), ev(3, "purchase", 20),
      ev(4, "other", 30), ev(5, "view", 40), ev(6, "purchase", 50))
    val bound = Cep.matchSortedBound(events, p)
    assert(bound.map(_.binds.map(_.ev.event_id)) == List(List(1L, 2L, 3L, 5L, 6L)))
    assert(bound.head.binds.map(_.step) == List("a", "v#1", "p#1", "v#2", "p#2"))
  }

  test("withinStep bounds each consecutive gap; within alone does not") {
    val min = 60L * 1000000
    // a(click) → b → c: gaps 20min then 40min; total 60min
    val events = IndexedSeq(
      ev(1, "click", 0), ev(2, "view", 20 * min), ev(3, "view", 60 * min))
    val base = Cep.Pattern.begin("a", _.event_type == "click")
      .next("b", _ => true).next("c", _ => true)
      .within(4 * 60 * min)
    // overall within accepts the 40-min middle gap…
    assert(Cep.matchSorted(events, base).map(_.event_ids) == List(Seq(1L, 2L, 3L)))
    // …per-step 30-min gap rejects it
    assert(Cep.matchSorted(events, base.withinStep(30 * min)).isEmpty)
    // both gaps under the bound → match again
    val tight = IndexedSeq(
      ev(1, "click", 0), ev(2, "view", 20 * min), ev(3, "view", 45 * min))
    assert(Cep.matchSorted(events = tight, base.withinStep(30 * min))
      .map(_.event_ids) == List(Seq(1L, 2L, 3L)))
    // withinStep without within is rejected (state eviction contract)
    intercept[IllegalArgumentException] {
      Cep.matchSorted(tight, Cep.Pattern.begin("a", _.event_type == "click")
        .next("b", _ => true).withinStep(30 * min))
    }
  }

  test("streaming: end-negated match held until the watermark closes its window") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val p = Cep.Pattern.begin("click", _.event_type == "click")
      .notFollowedBy("no_buy", _.event_type == "purchase")
      .within(100L * 1000000)
    val ms = MemoryStream[Ev]
    val q = Cep.run(ms.toDS(), p, watermarkDelay = "0 seconds").toDF()
      .writeStream.format("memory").queryName("t_cep_neg").outputMode("append").start()
    try {
      ms.addData(ev(1, "click", 0))
      q.processAllAvailable()
      // window [0, 100s] still open — absence not provable yet
      assert(spark.table("t_cep_neg").count() == 0)
      ms.addData(ev(2, "view", 400L * 1000000))
      q.processAllAvailable()
      ms.addData(ev(3, "view", 500L * 1000000)) // watermark now well past 100s
      q.processAllAvailable()
      val got = spark.table("t_cep_neg").as[CepMatch].collect()
      assert(got.map(_.event_ids).toSeq == Seq(Seq(1L)))
    } finally q.stop()
  }

  test("streaming: a timed-out partial emits its maximal prefix at eviction") {
    // TimedOutPartialMatchHandler analog: click@0 → view@10 bind the
    // first two steps; no purchase arrives before the within window
    // closes, so eviction emits ONE timeout record carrying BOTH binds
    // with __timedout:-prefixed step names.
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val sec = 1000000L
    val p = Cep.Pattern.begin("click", (_: Ev).event_type == "click")
      .followedBy("view", _.event_type == "view")
      .followedBy("purchase", _.event_type == "purchase")
      .within(50 * sec)
    val ms = MemoryStream[Ev]
    val q = Cep.runBoundBy(ms.toDS(), p, "user_id", "ts_us", "event_id",
        watermarkDelay = "0 seconds", timedOut = true).toDF()
      .writeStream.format("memory").queryName("t_cep_timeout")
      .outputMode("append").start()
    try {
      ms.addData(ev(1, "click", 0), ev(2, "view", 10 * sec))
      q.processAllAvailable()
      ms.addData(ev(3, "x", 100 * sec)) // wm 10s: nothing evicts yet
      q.processAllAvailable()
      ms.addData(ev(4, "x", 200 * sec)) // wm 100s: horizon 50s evicts ids 1, 2
      q.processAllAvailable()
      val got = spark.table("t_cep_timeout")
        .selectExpr("start_us", "end_us",
          "transform(binds, b -> b.step) AS steps",
          "transform(binds, b -> b.ev.event_id) AS ids")
        .as[(Long, Long, Seq[String], Seq[Long])].collect().toList
      assert(got == List((0L, 10 * sec,
        Seq(Cep.TimedOutStep + ":click", Cep.TimedOutStep + ":view"),
        Seq(1L, 2L))), s"got $got")
    } finally q.stop()
  }

  test("streaming: a strict-contiguity mismatch kills the run as a MISS, not a timeout") {
    // Reference fidelity (TimedOutPartialMatchHandler only receives
    // partials discarded by WINDOW EXPIRY): with PATTERN click NEXT
    // purchase, a click immediately followed by a view inside the
    // within window dies by the adjacency mismatch — no timeout record
    // — while a click whose adjacency slot is still EMPTY when the
    // horizon closes IS timed out.
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val sec = 1000000L
    val p = Cep.Pattern.begin("click", (_: Ev).event_type == "click")
      .next("purchase", _.event_type == "purchase")
      .within(50 * sec)
    val ms = MemoryStream[Ev]
    val q = Cep.runBoundBy(ms.toDS(), p, "user_id", "ts_us", "event_id",
        watermarkDelay = "0 seconds", timedOut = true).toDF()
      .writeStream.format("memory").queryName("t_cep_misskill")
      .outputMode("append").start()
    try {
      // click@0 + adjacent view@10s (in-window mismatch → MISS);
      // click@30s with NOTHING adjacent before the horizon (→ timeout)
      ms.addData(ev(1, "click", 0), ev(2, "view", 10 * sec),
        ev(3, "click", 30 * sec))
      q.processAllAvailable()
      ms.addData(ev(4, "x", 200 * sec)) // wm 30s
      q.processAllAvailable()
      ms.addData(ev(5, "x", 400 * sec)) // wm 200s: horizon evicts all real rows
      q.processAllAvailable()
      val got = spark.table("t_cep_misskill")
        .selectExpr("transform(binds, b -> b.step) AS steps",
          "transform(binds, b -> b.ev.event_id) AS ids")
        .as[(Seq[String], Seq[Long])].collect().toList
        .filter(_._1.exists(_.startsWith(Cep.TimedOutStep)))
      assert(got == List((Seq(Cep.TimedOutStep + ":click"), Seq(3L))),
        s"only the expiry-killed click (id 3) may time out; got $got")
    } finally q.stop()
  }

  test("streaming: an out-of-order batch falls back to re-derivation without duplicates") {
    // The incremental matcher resumes open runs only on append-only
    // batches; an arrival sorting BELOW the retained buffer discards
    // the cached runs and re-derives from the merged buffer — emitted
    // matches must not duplicate and cross-batch completions must
    // still land.
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val sec = 1000000L
    val p = Cep.Pattern.begin("a", (_: Ev).event_type == "click")
      .followedBy("b", _.event_type == "purchase")
      .within(3600 * sec)
    val ms = MemoryStream[Ev]
    val q = Cep.run(ms.toDS(), p, "2 hours").toDF()
      .writeStream.format("memory").queryName("t_cep_ooo")
      .outputMode("append").start()
    try {
      ms.addData(ev(10, "click", 300 * sec))
      q.processAllAvailable()
      // out-of-order: a view BELOW the buffered click (admitted — the
      // watermark delay covers it), plus the purchase that completes
      // the cross-batch match
      ms.addData(ev(5, "view", 250 * sec), ev(11, "purchase", 400 * sec))
      q.processAllAvailable()
      // append-only again: a second click+purchase pair resumes
      // incrementally after the fallback rebuilt the run cache
      ms.addData(ev(12, "click", 500 * sec))
      q.processAllAvailable()
      ms.addData(ev(13, "purchase", 600 * sec))
      q.processAllAvailable()
      val got = spark.table("t_cep_ooo").as[CepMatch].collect()
        .map(_.event_ids).toSet
      assert(got == Set(Seq(10L, 11L), Seq(12L, 13L)), s"got $got")
    } finally q.stop()
  }

  test("quantified incremental: single-batch emission equals the batch matcher, overlapping predicates") {
    // Patterns with a loop whose predicate OVERLAPS the continuation's
    // force the incremental matcher's backtrack forks (greedy) /
    // first-closing dominance (reluctant). A single-batch feed from
    // empty state is append-only, so the whole buffer goes through
    // incrementalScan — its emissions must equal matchSorted exactly,
    // including the per-start preferred-branch reduction.
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val sec = 1000000L
    val W = 2000 * sec
    val bOrC = (e: Ev) => e.event_type == "b" || e.event_type == "c"
    val patterns: List[(String, Cep.Pattern[Ev])] = List(
      "greedy_overlap" -> Cep.Pattern.begin("a", (_: Ev).event_type == "a")
        .oneOrMoreNext("bs", bOrC)
        .followedBy("cc", _.event_type == "c").within(W),
      "zstar_overlap" -> Cep.Pattern.begin("a", (_: Ev).event_type == "a")
        .zeroOrMoreNext("bs", bOrC)
        .followedBy("cc", _.event_type == "c").within(W),
      "reluctant_overlap" -> Cep.Pattern.begin("a", (_: Ev).event_type == "a")
        .oneOrMore("bs", bOrC)
        .followedBy("cc", _.event_type == "c").within(W),
      "greedy_trailing" -> Cep.Pattern.begin("a", (_: Ev).event_type == "a")
        .oneOrMoreNext("bs", _.event_type == "b").within(W),
      "greedy_skip_past" -> Cep.Pattern.begin("a", (_: Ev).event_type == "a")
        .oneOrMoreNext("bs", bOrC)
        .followedBy("cc", _.event_type == "c").within(W)
        .afterMatchSkip(Cep.SkipPastLast))
    for (seed <- 70L to 73L; (pname, pat) <- patterns) {
      assert(Cep.incrementalEligible(pat), s"$pname must take the incremental path")
      val rnd = new scala.util.Random(seed * 131 + pname.hashCode)
      val events = (1 to 40).map(i =>
        Ev(i.toLong, 1L, Seq("a", "b", "c")(rnd.nextInt(3)), i * sec, 1.0))
      val want = Cep.matchSorted(events.toIndexedSeq, pat)
        .map(_.event_ids).toSet
      val ms = MemoryStream[Ev]
      val name = StreamOps.freshName("cep_q1b")
      val q = Cep.run(ms.toDS(), pat, "0 seconds").toDF()
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        ms.addData(events: _*)
        q.processAllAvailable()
        val got = spark.table(name).as[CepMatch].collect().map(_.event_ids).toSet
        assert(got == want, s"seed=$seed pattern=$pname\n got=$got\n want=$want")
      } finally q.stop()
    }
  }

  test("quantified hot-key flood: per-batch cost is open-runs × new events, not × buffer") {
    // The round-14 verdict's remaining CEP stress case: a QUANTIFIED
    // pattern (reluctant relaxed oneOrMore) on one key. Clicks open
    // runs, views feed each run's first repetition, the continuation
    // never completes — the re-scan path would re-derive every run
    // over the whole buffer per batch (≈ n²·B/3); the incremental
    // loop handling bills open-runs × NEW events (≈ n²/4 here).
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val sec = 1000000L
    val n = 1200
    val batches = 8
    val p = Cep.Pattern.begin("a", (_: Ev).event_type == "click")
      .oneOrMore("bs", _.event_type == "view")
      .followedBy("c", _.event_type == "no_such_type")
      .within(86400L * 365 * sec)
    assert(Cep.incrementalEligible(p))
    val events = (1 to n).map(i =>
      ev(i.toLong, if (i % 2 == 0) "view" else "click", i.toLong * sec))
    val ms = MemoryStream[Ev]
    val q = Cep.run(ms.toDS(), p, "0 seconds").toDF()
      .writeStream.format("memory").queryName("t_cep_qflood")
      .outputMode("append").start()
    try {
      Cep.scanOps.reset()
      events.grouped(n / batches).foreach { b =>
        ms.addData(b: _*); q.processAllAvailable()
      }
      val ops = Cep.scanOps.sum()
      val bound = n.toLong * n // incremental ≈ n²/4; re-scan ≈ n²·B/3 ≈ 2.7·n²
      assert(ops <= bound,
        s"quantified per-batch matcher cost must track NEW events, not " +
          s"the buffer: $ops advance attempts > $bound for n=$n, B=$batches")
      assert(spark.table("t_cep_qflood").count() == 0)
    } finally q.stop()
  }

  test("hot-key flood: per-batch cost is open-runs × new events, not × buffer") {
    // The round-13 verdict's CEP stress case: ONE key, every event
    // inside one within horizon, a head predicate that always opens a
    // run and a second step that never completes — the worst case for
    // the old per-batch re-scan, whose cost was Σ_b (runs_b × buffer_b)
    // ≈ n²·B/3 advance attempts for B batches. The incremental matcher
    // bills runs_b × NEW events (the reference NFA's per-event cost,
    // cep/nfa/NFA.java:86), Σ ≈ n²/2 — the scanOps counter pins that
    // bound, which any buffer-proportional re-scan breaks by ~2B/3×.
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val sec = 1000000L
    val n = 1200
    val batches = 8
    val p = Cep.Pattern.begin("a", (_: Ev).event_type == "click")
      .followedBy("b", _.event_type == "no_such_type")
      .within(86400L * 365 * sec)
    val events = (1 to n).map(i => ev(i.toLong, "click", i.toLong * sec))
    val ms = MemoryStream[Ev]
    val q = Cep.run(ms.toDS(), p, "0 seconds").toDF()
      .writeStream.format("memory").queryName("t_cep_flood")
      .outputMode("append").start()
    try {
      Cep.scanOps.reset()
      events.grouped(n / batches).foreach { b =>
        ms.addData(b: _*); q.processAllAvailable()
      }
      val ops = Cep.scanOps.sum()
      val bound = n.toLong * n // incremental ≈ n²/2; old re-scan ≈ n²·B/3 ≈ 2.7·n²
      assert(ops <= bound,
        s"per-batch matcher cost must track NEW events, not the buffer: " +
          s"$ops advance attempts > $bound for n=$n, B=$batches")
      assert(spark.table("t_cep_flood").count() == 0)
    } finally q.stop()
  }

  test("streaming: events below the admission horizon surface on the late channel") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val sec = 1000000L
    val p = Cep.Pattern.begin("click", (_: Ev).event_type == "click")
      .followedBy("purchase", _.event_type == "purchase")
      .within(50 * sec)
    val ms = MemoryStream[Ev]
    val q = Cep.runBoundBy(ms.toDS(), p, "user_id", "ts_us", "event_id",
        watermarkDelay = "0 seconds", lateCapture = true).toDF()
      .writeStream.format("memory").queryName("t_cep_late")
      .outputMode("append").start()
    try {
      ms.addData(ev(1, "click", 100 * sec))
      q.processAllAvailable() // wm 0 during the batch; 100s after
      // wm 100s, horizon 50s: ts 10s is LATE (captured), 60s admitted
      ms.addData(ev(2, "view", 10 * sec), ev(3, "view", 60 * sec))
      q.processAllAvailable()
      val got = spark.table("t_cep_late")
        .selectExpr("binds[0].step AS step", "binds[0].ev.event_id AS id")
        .as[(String, Long)].collect().toList
      assert(got == List((Cep.LateStep, 2L)), s"got $got")
    } finally q.stop()
  }

  test("allowCombinations enumerates in-order sub-sequences (reference Pattern.java:429)") {
    // the reference doc's exact example: A.oneOrMore().allowCombinations()
    // .followedBy(B) over A1 A2 B yields A1 B, A2 B, A1 A2 B (without
    // combinations only A1 B and A1 A2 B appear across starts)
    val headLoop = Cep.Pattern.of[Ev]("A", _.event_type == "a")
    val p = headLoop.copy(steps = headLoop.steps.map(
        _.copy(strict = true, quant = Cep.OneOrMore)))
      .allowCombinations()
      .followedBy("B", _.event_type == "b")
      .within(600L * 1000000)
    val events = IndexedSeq(ev(1, "a", 0), ev(2, "a", 10), ev(3, "b", 20))
    val ms = Cep.matchSortedG[Ev](events, p, _.ts_us, _.event_id)
    assert(ms.map(_.binds.map(_.ev.event_id)).toSet ==
      Set(List(1L, 3L), List(2L, 3L), List(1L, 2L, 3L)), s"got $ms")

    // non-head loop: the FIRST repetition keeps followedBy's
    // first-qualifying contiguity (the reference's preceding
    // ConsumingStrategy); combinations branch only the later reps
    val p2 = Cep.Pattern.of[Ev]("C", _.event_type == "click")
      .oneOrMore("A", _.event_type == "a")
      .allowCombinations()
      .followedBy("B", _.event_type == "b")
      .within(600L * 1000000)
    val evs2 = IndexedSeq(
      ev(1, "click", 0), ev(2, "a", 10), ev(3, "a", 20), ev(4, "b", 30))
    val ms2 = Cep.matchSortedG[Ev](evs2, p2, _.ts_us, _.event_id)
    assert(ms2.map(_.binds.map(_.ev.event_id)).toSet ==
      Set(List(1L, 2L, 4L), List(1L, 2L, 3L, 4L)), s"got $ms2")

    // until() stops the enumeration: reps at/after the stop row are
    // never taken, in any branch
    val p3 = Cep.Pattern.of[Ev]("C", _.event_type == "click")
      .oneOrMore("A", _.event_type == "a")
      .until(_.event_type == "stop")
      .allowCombinations()
      .followedBy("B", _.event_type == "b")
      .within(600L * 1000000)
    val evs3 = IndexedSeq(
      ev(1, "click", 0), ev(2, "a", 10), ev(5, "stop", 15),
      ev(3, "a", 20), ev(4, "b", 30))
    val ms3 = Cep.matchSortedG[Ev](evs3, p3, _.ts_us, _.event_id)
    assert(ms3.map(_.binds.map(_.ev.event_id)).toSet ==
      Set(List(1L, 2L, 4L)), s"got $ms3")

    // guarded composition: only oneOrMore-family steps accept it
    intercept[IllegalArgumentException] {
      Cep.Pattern.of[Ev]("C", _.event_type == "click").allowCombinations()
    }
  }

  test("timesOrMore requires n reps then extends reluctantly (reference Pattern.timesOrMore)") {
    val p = Cep.Pattern.of[Ev]("C", _.event_type == "click")
      .timesOrMore("V", _.event_type == "view", 2)
      .followedBy("B", _.event_type == "purchase")
      .within(600L * 1000000)
    // one view only: the {2,} floor is not met
    val tooFew = IndexedSeq(ev(1, "click", 0), ev(2, "view", 10), ev(3, "purchase", 20))
    assert(Cep.matchSortedG[Ev](tooFew, p, _.ts_us, _.event_id).isEmpty)
    // three views: reluctant tail stops at the floor (minimal), B takes
    // the first later purchase — the {n,} SQL quantifier's expansion
    val enough = IndexedSeq(
      ev(1, "click", 0), ev(2, "view", 10), ev(3, "view", 20),
      ev(4, "view", 30), ev(5, "purchase", 40))
    val ms = Cep.matchSortedG[Ev](enough, p, _.ts_us, _.event_id)
    assert(ms.map(_.binds.map(_.ev.event_id)) == List(List(1L, 2L, 3L, 5L)), s"got $ms")
  }
}
