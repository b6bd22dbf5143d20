package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.{col, timestamp_micros}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Union-typed output of the late-capturing window aggregate: `agg`
 * rows are finalized windows (n, sum_cents populated, late_event_id =
 * -1); `late` rows carry the captured event's id for its
 * already-finalized window (n = sum_cents = 0). */
case class LateWinRow(kind: String, user_id: Long, ws_us: Long,
    n: Long, sum_cents: Long, late_event_id: Long)

/** Per-key open windows: (window_start_us, count, cent_sum). */
case class LateCapState(windows: List[(Long, Long, Long)])

/** Output of [[LateCapture.tumbleWithLateness]]: `agg` rows are a
 * window's FIRST firing (fire_seq = 0), `update` rows its cumulative
 * re-firings for late-but-allowed arrivals (fire_seq 1, 2, …), `late`
 * rows the beyond-lateness captures (fire_seq = -1, late_event_id
 * set). */
case class LatenessWinRow(kind: String, user_id: Long, ws_us: Long,
    fire_seq: Long, n: Long, sum_cents: Long, late_event_id: Long)

/** Per-key window state for [[LateCapture.tumbleWithLateness]]:
 * (window_start_us, count, cent_sum, fires_so_far, fired). */
case class LatenessState(windows: List[(Long, Long, Long, Long, Boolean)])

/** Output of [[LateCapture.sessionWithLateness]]: one firing of a
 * session window `[ws_us, we_us)` (we = last element + gap). A late
 * row can MERGE sessions — including already-fired ones — so a firing
 * may supersede earlier firings of overlapping ranges; `emit_seq` is
 * the per-key emission order, and the FINAL image is the set of
 * firings no later overlapping firing supersedes. `late` rows are
 * beyond-lateness captures. */
case class SessLateRow(kind: String, user_id: Long, ws_us: Long, we_us: Long,
    emit_seq: Long, n: Long, sum_cents: Long, late_event_id: Long)

/** Per-key session state for [[LateCapture.sessionWithLateness]]:
 * sessions as (start, end, count, cent_sum, fires, dirty) plus the
 * per-key emission counter. */
case class SessLateState(sessions: List[(Long, Long, Long, Long, Long, Boolean)],
    emits: Long)

/**
 * Tumbling event-time window aggregation WITH late-data side capture —
 * the reference's `WindowedStream.java:108` `sideOutputLateData`
 * composed with the window operator: a row whose window is already
 * finalized (window_end <= watermark) is emitted on the late side
 * instead of being silently dropped (Spark's built-in windowed agg
 * drops it — SURVEY §7.5's documented divergence, closed here).
 *
 * Windows finalize when the watermark passes their end, evaluated on
 * the key's next invocation. Event-time timeouts CANNOT drive closure
 * here: with `EventTimeTimeout`, Spark filters sub-watermark input
 * rows out before the function runs — the very rows this operator
 * captures. So the operator runs with `NoTimeout` (no input filter)
 * and relies on key activity — in bounded runs, the per-key
 * end-of-input sentinel cascade (`StreamOps
 * .eventsTypedWithKeyedSentinels`) invokes every key after the
 * watermark has passed all data, the analog of the reference flushing
 * on the final MAX_WATERMARK. State per key is the open windows only
 * — watermark-bounded. Sentinel rows (event_id < 0) drive watermark
 * and invocation but never aggregate.
 */
object LateCapture {

  def tumble(ds: Dataset[Ev], sizeUs: Long,
      watermarkDelay: String = "0 seconds",
      ttl: Option[String] = None): Dataset[LateWinRow] = {
    import ds.sparkSession.implicits._
    val withWm = ds.toDF()
      .withColumn("__event_ts", timestamp_micros(col("ts_us")))
      .withWatermark("__event_ts", watermarkDelay)
      .as[Ev]
    withWm.groupByKey(_.user_id)
      .flatMapGroupsWithState[LateCapState, LateWinRow](
          OutputMode.Append, Ttl.timeoutConf(ttl))(Ttl.wrap(ttl) {
        (key, it, state: GroupState[LateCapState]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          var wins = state.getOption.fold(Map.empty[Long, (Long, Long)])(
            _.windows.map(w => w._1 -> (w._2, w._3)).toMap)
          val out = List.newBuilder[LateWinRow]
          it.toList.filter(_.event_id >= 0)
            .sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
              val ws = e.ts_us - java.lang.Math.floorMod(e.ts_us, sizeUs)
              if (ws + sizeUs <= wmUs) // window already fired → side output
                out += LateWinRow("late", key, ws, 0L, 0L, e.event_id)
              else {
                val (n, c) = wins.getOrElse(ws, (0L, 0L))
                wins += ws -> (n + 1, c + math.floor(e.value * 100).toLong)
              }
            }
          val (closed, open) = wins.partition(_._1 + sizeUs <= wmUs)
          closed.toList.sortBy(_._1).foreach { case (ws, (n, c)) =>
            out += LateWinRow("agg", key, ws, n, c, -1L)
          }
          state.update(LateCapState(open.toList.map(w => (w._1, w._2._1, w._2._2))))
          out.result().iterator
      })
  }

  /**
   * Tumbling event-time windows with ALLOWED LATENESS — the reference's
   * `WindowedStream.java:108` `allowedLateness(Time)` +
   * `sideOutputLateData` composition: a window fires when the watermark
   * passes its end, then KEEPS its state for `latenessUs`; an element
   * arriving in (end, end + lateness] re-fires the window with the
   * cumulative (updated) result, and an element beyond the lateness
   * horizon goes to the late side instead (`EventTimeTrigger.onElement`
   * returning FIRE for late-but-allowed elements). `fire_seq` orders a
   * window's firings, so a changelog consumer keeps the max-seq image.
   *
   * Micro-batch firing discipline: on each invocation, (1) windows that
   * became due fire FIRST with their previously-accumulated content —
   * the watermark that closed them conceptually precedes this batch's
   * elements — then (2) the batch's rows accumulate (or are captured if
   * beyond lateness), and (3) touched windows emit: already-fired ones
   * as `update`, newly-created already-due ones as their first `agg`.
   * State evicts a window only once the watermark passes
   * end + lateness, so state stays watermark-bounded with the lateness
   * horizon added — exactly the reference's window-state cost model.
   * Same NoTimeout + keyed-sentinel discipline as [[tumble]] (late rows
   * are the operator's input, so the exec-level late filter must stay
   * out of the path).
   */
  def tumbleWithLateness(ds: Dataset[Ev], sizeUs: Long, latenessUs: Long,
      watermarkDelay: String = "0 seconds",
      ttl: Option[String] = None,
      perElement: Boolean = false): Dataset[LatenessWinRow] = {
    import ds.sparkSession.implicits._
    require(latenessUs >= 0, "allowed lateness must be non-negative")
    val withWm = ds.toDF()
      .withColumn("__event_ts", timestamp_micros(col("ts_us")))
      .withWatermark("__event_ts", watermarkDelay)
      .as[Ev]
    withWm.groupByKey(_.user_id)
      .flatMapGroupsWithState[LatenessState, LatenessWinRow](
          OutputMode.Append, Ttl.timeoutConf(ttl))(Ttl.wrap(ttl) {
        (key, it, state: GroupState[LatenessState]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          // ws -> (n, cents, fires, fired)
          var wins = state.getOption.fold(Map.empty[Long, (Long, Long, Long, Boolean)])(
            _.windows.map(w => w._1 -> (w._2, w._3, w._4, w._5)).toMap)
          val out = List.newBuilder[LatenessWinRow]
          // (1) fire windows the watermark closed before this batch's rows
          wins.toList.sortBy(_._1).foreach { case (ws, (n, c, fires, fired)) =>
            if (!fired && ws + sizeUs <= wmUs) {
              out += LatenessWinRow("agg", key, ws, fires, n, c, -1L)
              wins += ws -> (n, c, fires + 1, true)
            }
          }
          // (2) accumulate / capture this batch's rows. In PER-ELEMENT
          // mode (the reference's exact cadence — WindowOperator
          // processElement → EventTimeTrigger.onElement returns FIRE
          // for every late-but-allowed element of an already-due
          // window, `WindowOperator.java:98`), each such element emits
          // its own cumulative firing HERE instead of coalescing into
          // one end-of-batch update; elements of not-yet-due windows
          // accumulate silently in both modes (onElement → CONTINUE).
          var dirty = Set.empty[Long]
          it.toList.filter(_.event_id >= 0)
            .sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
              val ws = e.ts_us - java.lang.Math.floorMod(e.ts_us, sizeUs)
              if (ws + sizeUs + latenessUs <= wmUs)
                out += LatenessWinRow("late", key, ws, -1L, 0L, 0L, e.event_id)
              else {
                val (n, c, fires, fired) = wins.getOrElse(ws, (0L, 0L, 0L, false))
                val acc = (n + 1, c + math.floor(e.value * 100).toLong, fires, fired)
                if (perElement && ws + sizeUs <= wmUs) {
                  out += LatenessWinRow(if (fired) "update" else "agg",
                    key, ws, acc._3, acc._1, acc._2, -1L)
                  wins += ws -> (acc._1, acc._2, acc._3 + 1, true)
                } else {
                  wins += ws -> acc
                  dirty += ws
                }
              }
            }
          // (3) touched due windows emit: updates for fired ones, first
          // firings for windows created by late-but-allowed rows
          dirty.toList.sorted.foreach { ws =>
            val (n, c, fires, fired) = wins(ws)
            if (ws + sizeUs <= wmUs) {
              out += LatenessWinRow(if (fired) "update" else "agg", key, ws, fires, n, c, -1L)
              wins += ws -> (n, c, fires + 1, true)
            }
          }
          val open = wins.filter { case (ws, _) => ws + sizeUs + latenessUs > wmUs }
          state.update(LatenessState(open.toList.map(w =>
            (w._1, w._2._1, w._2._2, w._2._3, w._2._4))))
          out.result().iterator
      })
  }

  /**
   * SESSION windows with ALLOWED LATENESS and late-session MERGING —
   * the reference's `EventTimeSessionWindows` + `MergingWindowSet`
   * (`runtime/operators/windowing/MergingWindowSet.java:58`) under
   * `allowedLateness`: a session fires when the watermark passes its
   * end (last element + gap) and its state is KEPT for `latenessUs`;
   * a late-but-allowed element merges with every session it touches —
   * INCLUDING already-fired ones, possibly bridging two fired sessions
   * into one — and the merged session re-fires cumulatively. As in the
   * reference, superseded firings are not retracted; the emitted
   * `emit_seq` gives downstream the per-key order, so the final image
   * is the set of firings with no later overlapping firing (the gate's
   * oracle contract). Beyond-lateness rows go to the late side.
   *
   * Touch-or-overlap merging (`TimeWindow.intersects` is inclusive):
   * two elements exactly `gap` apart share a session, matching the
   * batch island sweep's `diff > gap` break rule. A batch's rows merge
   * before its re-firings emit, so several late rows landing in one
   * micro-batch produce ONE cumulative update (the per-element trigger
   * would fire per row; coalescing is the micro-batch analog and keeps
   * the emission sequence a pure function of data + batch cuts).
   *
   * PER-ELEMENT mode (`perElement = true`) reproduces the reference's
   * exact cadence on MERGED windows too (`WindowOperator.java:98`
   * processElement → merge via `MergingWindowSet` → `EventTimeTrigger
   * .onElement` returns FIRE for an already-due merged window): each
   * late-but-allowed element whose MERGED session is due emits its own
   * cumulative firing immediately — window identity changes across
   * merges, so consecutive firings may carry different `[ws, we)`
   * extents. Elements of not-yet-due sessions accumulate silently in
   * both modes and fire on watermark passage.
   *
   * Too-late test: `ts + gap + lateness <= watermark` — the element's
   * own would-be window END plus lateness, consistent with
   * [[tumbleWithLateness]]'s window-cleanup rule. The reference's
   * merging-window path (`WindowOperator.isElementLate`) tests
   * `ts + lateness <= watermark`, one gap stricter; this operator
   * therefore admits (and merges) a gap-wide corridor of rows the
   * reference would side-output. Both keep the invariant that an
   * admitted row's merged session is still in state.
   */
  def sessionWithLateness(ds: Dataset[Ev], gapUs: Long, latenessUs: Long,
      watermarkDelay: String = "0 seconds",
      ttl: Option[String] = None,
      perElement: Boolean = false): Dataset[SessLateRow] = {
    import ds.sparkSession.implicits._
    require(gapUs > 0 && latenessUs >= 0, "need positive gap, non-negative lateness")
    val withWm = ds.toDF()
      .withColumn("__event_ts", timestamp_micros(col("ts_us")))
      .withWatermark("__event_ts", watermarkDelay)
      .as[Ev]
    withWm.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessLateState, SessLateRow](
          OutputMode.Append, Ttl.timeoutConf(ttl))(Ttl.wrap(ttl) {
        (key, it, state: GroupState[SessLateState]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val st = state.getOption.getOrElse(SessLateState(Nil, 0L))
          // (start, end, n, cents, fires, dirty)
          var sess = st.sessions
          var emits = st.emits
          val out = List.newBuilder[SessLateRow]
          def fireDue(): Unit = {
            sess = sess.sortBy(_._1).map { case s @ (ws, we, n, c, fires, dirty) =>
              if (dirty && we <= wmUs) {
                out += SessLateRow(if (fires == 0) "agg" else "update",
                  key, ws, we, emits, n, c, -1L)
                emits += 1
                (ws, we, n, c, fires + 1, false)
              } else s
            }
          }
          // (1) sessions the watermark closed before this batch's rows
          // fire with their pre-batch content
          fireDue()
          // (2) merge this batch's rows; capture beyond-lateness ones
          it.toList.filter(_.event_id >= 0)
            .sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
              if (e.ts_us + gapUs + latenessUs <= wmUs) {
                out += SessLateRow("late", key, e.ts_us, e.ts_us + gapUs,
                  -1L, 0L, 0L, e.event_id)
              } else {
                val cents = math.floor(e.value * 100).toLong
                val (touch, rest) = sess.partition(s =>
                  e.ts_us <= s._2 && s._1 <= e.ts_us + gapUs)
                val merged = (
                  (e.ts_us +: touch.map(_._1)).min,
                  ((e.ts_us + gapUs) +: touch.map(_._2)).max,
                  touch.map(_._3).sum + 1,
                  touch.map(_._4).sum + cents,
                  touch.map(_._5).sum, // merged fire count: superseding continues the lineage
                  true)
                if (perElement && merged._2 <= wmUs) {
                  // reference cadence: the merged window is already due,
                  // so this element's arrival FIRES it immediately
                  out += SessLateRow(if (merged._5 == 0L) "agg" else "update",
                    key, merged._1, merged._2, emits, merged._3, merged._4, -1L)
                  emits += 1
                  sess = (merged._1, merged._2, merged._3, merged._4,
                    merged._5 + 1, false) :: rest
                } else sess = merged :: rest
              }
            }
          // (3) due merged/new sessions re-fire (or first-fire) with
          // cumulative content
          fireDue()
          val open = sess.filter(s => s._2 + latenessUs > wmUs)
          if (open.isEmpty) state.remove()
          else state.update(SessLateState(open, emits))
          out.result().iterator
      })
  }
}
