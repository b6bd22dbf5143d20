package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.{col, timestamp_micros}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One DeltaTrigger firing: the window's accumulation at the firing
 * element (the element itself included). */
case class DeltaFireRow(event_type: String, ws_us: Long, fire_id: Long,
    n_at_fire: Long, cents_at_fire: Long)

/** Per-key DeltaTrigger state: open windows → (baseline cents of the
 * element that fired last — or the first element — plus the running
 * count/sum), and the not-yet-released rows ((ts, id, cents), held
 * until the watermark passes them so the fold order is final). */
case class DeltaTrigState(open: List[(Long, Long, Long, Long, Boolean)],
    pending: List[(Long, Long, Long)])

/** One ContinuousEventTimeTrigger firing: the window's accumulation
 * over events strictly before the fire timestamp; `fire_us` is the
 * window end for the final firing. */
case class ContFireRow(event_type: String, ws_us: Long, fire_us: Long,
    n_so_far: Long, cents_so_far: Long)

/** Per-key continuous-trigger state: open windows →
 * (ws, minTs, lastFired, n, cents, hasFired) plus unabsorbed rows. */
case class ContTrigState(open: List[(Long, Long, Long, Long, Long, Boolean)],
    pending: List[(Long, Long, Long)])

/** One PurgingTrigger(CountTrigger) firing: the PANE accumulated since
 * the previous firing (purge clears the window content at each fire). */
case class PurgeFireRow(event_type: String, ws_us: Long, fire_idx: Long,
    n_rows: Long, pane_cents: Long)

/** Per-key purging-count-trigger state: open windows →
 * (ws, count_since_fire, cents_since_fire, fires_so_far) plus the
 * not-yet-released rows. */
case class PurgeTrigState(open: List[(Long, Long, Long, Long)],
    pending: List[(Long, Long, Long)])

/**
 * Custom window TRIGGERS beyond the gated CountTrigger/early-firing
 * pair: the reference's DeltaTrigger and ContinuousEventTimeTrigger
 * re-expressed over `flatMapGroupsWithState`.
 *
 * Both release work only as the event-time watermark passes it, so the
 * emission sequence is a pure function of the event data — the
 * micro-batch boundaries can't change what fires (the analog of the
 * reference firing these off watermark-driven timers, not wall clock).
 */
object Triggers {

  /**
   * DELTA TRIGGER (reference
   * `streaming/api/windowing/triggers/DeltaTrigger.java:52-64`): per
   * window, the first element arms a baseline and does not fire; each
   * later element fires iff `delta(baseline, element) > threshold`,
   * and a firing element becomes the new baseline. A firing emits the
   * window's current accumulation (FIRE, no purge). Delta is the
   * absolute integer-cent difference. There is no end-of-window
   * firing: a window whose tail never exceeds the threshold emits
   * nothing more — exactly the reference's behavior when DeltaTrigger
   * REPLACES the default event-time trigger.
   *
   * Elements fold in (ts, id) order once the watermark passes them
   * (rows at ts >= watermark stay pending — a same-ts peer could
   * still arrive and change the fold order). State per key: open
   * windows × one (baseline, n, sum) triple + the pending rows of the
   * current watermark band — bounded by data density, not window span.
   */
  def tumbleDeltaTrigger(ds: Dataset[Ev], sizeUs: Long, thresholdCents: Long,
      watermarkDelay: String = "0 seconds"): Dataset[DeltaFireRow] = {
    import ds.sparkSession.implicits._
    require(thresholdCents >= 1 && sizeUs >= 1, "need positive window and threshold")
    val withWm = ds.toDF()
      .withColumn("__event_ts", timestamp_micros(col("ts_us")))
      .withWatermark("__event_ts", watermarkDelay)
      .as[Ev]
    withWm.groupByKey(_.event_type)
      .flatMapGroupsWithState[DeltaTrigState, DeltaFireRow](
          OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key, it, state: GroupState[DeltaTrigState]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val st = state.getOption.getOrElse(DeltaTrigState(Nil, Nil))
          // (baseline, n, sum, armed) per open window
          var open = st.open.iterator.map { case (ws, b, n, s, armed) => ws -> (b, n, s, armed) }.toMap
          val fresh = it.filter(_.event_id >= 0)
            .map(e => (e.ts_us, e.event_id, math.floor(e.value * 100).toLong))
            // a row whose window the watermark already closed is late
            .filter(r => Math.floorDiv(r._1, sizeUs) * sizeUs + sizeUs > wmUs)
          val (ready, pending) = (st.pending ++ fresh).partition(_._1 < wmUs)
          val out = List.newBuilder[DeltaFireRow]
          ready.sortBy(r => (r._1, r._2)).foreach { case (ts, id, cents) =>
            val ws = Math.floorDiv(ts, sizeUs) * sizeUs
            open.getOrElse(ws, (0L, 0L, 0L, false)) match {
              case (_, n, s, false) => open += ws -> (cents, n + 1, s + cents, true)
              case (b, n, s, true) =>
                val fires = math.abs(cents - b) > thresholdCents
                if (fires) out += DeltaFireRow(key, ws, id, n + 1, s + cents)
                open += ws -> (if (fires) cents else b, n + 1, s + cents, true)
            }
          }
          open = open.filter { case (ws, _) => ws + sizeUs > wmUs }
          if (open.isEmpty && pending.isEmpty) state.remove()
          else {
            state.update(DeltaTrigState(
              open.iterator.map { case (ws, (b, n, s, a)) => (ws, b, n, s, a) }.toList, pending))
            val nextUs = (open.keysIterator.map(_ + sizeUs) ++ pending.iterator.map(_._1 + 1)).min
            state.setTimeoutTimestamp(math.max((nextUs + 999) / 1000, state.getCurrentWatermarkMs() + 1))
          }
          out.result().iterator
      }
  }

  /**
   * CONTINUOUS EVENT-TIME TRIGGER (reference
   * `streaming/api/windowing/triggers/ContinuousEventTimeTrigger.java:51-92`):
   * the window fires repeatedly while open — the first element arms a
   * timer at `align(ts, interval) + interval`, each firing re-arms at
   * `+interval`, and the window's own end fires the final pane. A
   * firing at boundary `b` emits the accumulation over events with
   * `ts < b` (the events the watermark has sealed below the boundary —
   * every element the reference's buffer is guaranteed to hold at that
   * timer, independent of arrival batching).
   *
   * The boundary grid is interval-aligned, so a later-arriving element
   * can only move the FIRST boundary earlier while no boundary has
   * fired — once one fired (watermark ≥ b), any element below it would
   * be late; the fired history is immutable. State per (key, window):
   * one (minTs, lastFired, n, sum) record + the unabsorbed rows of the
   * current interval band.
   */
  def tumbleContinuousTrigger(ds: Dataset[Ev], sizeUs: Long, intervalUs: Long,
      watermarkDelay: String = "0 seconds"): Dataset[ContFireRow] = {
    import ds.sparkSession.implicits._
    require(intervalUs >= 1 && sizeUs >= 1, "need positive window and interval")
    val withWm = ds.toDF()
      .withColumn("__event_ts", timestamp_micros(col("ts_us")))
      .withWatermark("__event_ts", watermarkDelay)
      .as[Ev]
    withWm.groupByKey(_.event_type)
      .flatMapGroupsWithState[ContTrigState, ContFireRow](
          OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key, it, state: GroupState[ContTrigState]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val st = state.getOption.getOrElse(ContTrigState(Nil, Nil))
          var open = st.open.iterator
            .map { case (ws, mn, lf, n, s, f) => ws -> (mn, lf, n, s, f) }.toMap
          var pending = st.pending
          it.filter(e => e.event_id >= 0 && e.ts_us >= wmUs).foreach { e =>
            val ts = e.ts_us
            val ws = Math.floorDiv(ts, sizeUs) * sizeUs
            val cents = math.floor(e.value * 100).toLong
            open += ws -> (open.get(ws) match {
              case Some((mn, lf, n, s, f)) => (math.min(mn, ts), lf, n, s, f)
              case None => (ts, 0L, 0L, 0L, false)
            })
            pending ::= (ts, e.event_id, cents)
          }
          val out = List.newBuilder[ContFireRow]
          val still = List.newBuilder[(Long, Long, Long, Long, Long, Boolean)]
          open.toList.sortBy(_._1).foreach { case (ws, (mn, lf0, n0, s0, f0)) =>
            val we = ws + sizeUs
            var (lf, n, s, fired) = (lf0, n0, s0, f0)
            def absorb(bound: Long): Unit = {
              val (in, rest) = pending.partition(r =>
                r._1 < bound && Math.floorDiv(r._1, sizeUs) * sizeUs == ws)
              n += in.size; s += in.iterator.map(_._3).sum; pending = rest
            }
            var next = if (fired) lf + intervalUs
                       else Math.floorDiv(mn, intervalUs) * intervalUs + intervalUs
            while (next <= wmUs && next < we) {
              absorb(next)
              out += ContFireRow(key, ws, next, n, s)
              lf = next; fired = true; next += intervalUs
            }
            if (we <= wmUs) { // final firing, then the window closes
              absorb(we)
              out += ContFireRow(key, ws, we, n, s)
            } else still += ((ws, mn, lf, n, s, fired))
          }
          val kept = still.result()
          if (kept.isEmpty && pending.isEmpty) state.remove()
          else {
            state.update(ContTrigState(kept, pending))
            val nextUs = (kept.iterator.map { case (ws, mn, lf, _, _, f) =>
              val nb = if (f) lf + intervalUs
                       else Math.floorDiv(mn, intervalUs) * intervalUs + intervalUs
              math.min(nb, ws + sizeUs)
            } ++ pending.iterator.map(_._1 + 1)).min
            state.setTimeoutTimestamp(math.max((nextUs + 999) / 1000, state.getCurrentWatermarkMs() + 1))
          }
          out.result().iterator
      }
  }

  /**
   * PURGING COUNT TRIGGER (reference
   * `streaming/api/windowing/triggers/PurgingTrigger.java:36-43`
   * wrapping `CountTrigger.java:39-47` — the canonical
   * `PurgingTrigger.of(CountTrigger.of(n))` composition): within each
   * tumbling event-time window, every n-th element FIRE_AND_PURGEs —
   * the emitted pane is the accumulation SINCE THE PREVIOUS FIRING,
   * and the window content clears at each fire. As with
   * [[tumbleDeltaTrigger]], the wrapped trigger REPLACES the default
   * event-time trigger, so a trailing partial pane never fires and
   * window state drops when the watermark passes the window end.
   *
   * Elements fold in (ts, id) order once the watermark passes them, so
   * pane boundaries are a pure function of the data. State per key:
   * open windows × one (count, sum, fires) triple + the pending rows
   * of the current watermark band.
   */
  def tumblePurgingCountTrigger(ds: Dataset[Ev], sizeUs: Long, n: Int,
      watermarkDelay: String = "0 seconds"): Dataset[PurgeFireRow] = {
    import ds.sparkSession.implicits._
    require(n >= 1 && sizeUs >= 1, "need positive window and count")
    val withWm = ds.toDF()
      .withColumn("__event_ts", timestamp_micros(col("ts_us")))
      .withWatermark("__event_ts", watermarkDelay)
      .as[Ev]
    withWm.groupByKey(_.event_type)
      .flatMapGroupsWithState[PurgeTrigState, PurgeFireRow](
          OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key, it, state: GroupState[PurgeTrigState]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val st = state.getOption.getOrElse(PurgeTrigState(Nil, Nil))
          var open = st.open.iterator.map { case (ws, c, s, f) => ws -> (c, s, f) }.toMap
          val fresh = it.filter(_.event_id >= 0)
            .map(e => (e.ts_us, e.event_id, math.floor(e.value * 100).toLong))
            .filter(r => Math.floorDiv(r._1, sizeUs) * sizeUs + sizeUs > wmUs)
          val (ready, pending) = (st.pending ++ fresh).partition(_._1 < wmUs)
          val out = List.newBuilder[PurgeFireRow]
          ready.sortBy(r => (r._1, r._2)).foreach { case (ts, _, cents) =>
            val ws = Math.floorDiv(ts, sizeUs) * sizeUs
            val (c, s, f) = open.getOrElse(ws, (0L, 0L, 0L))
            if (c + 1 == n) {
              out += PurgeFireRow(key, ws, f + 1, n.toLong, s + cents)
              open += ws -> (0L, 0L, f + 1) // FIRE_AND_PURGE
            } else open += ws -> (c + 1, s + cents, f)
          }
          open = open.filter { case (ws, _) => ws + sizeUs > wmUs }
          if (open.isEmpty && pending.isEmpty) state.remove()
          else {
            state.update(PurgeTrigState(
              open.iterator.map { case (ws, (c, s, f)) => (ws, c, s, f) }.toList, pending))
            val nextUs = (open.keysIterator.map(_ + sizeUs) ++ pending.iterator.map(_._1 + 1)).min
            state.setTimeoutTimestamp(math.max((nextUs + 999) / 1000, state.getCurrentWatermarkMs() + 1))
          }
          out.result().iterator
      }
  }
}
