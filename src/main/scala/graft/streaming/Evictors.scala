package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.{col, timestamp_micros}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One finalized evictor window: the kept-element count and their
 * integer-cent sum. */
case class EvictWinRow(user_id: Long, ws_us: Long, n_kept: Long, kept_cents: Long)

/** Per-key state: open windows → their bounded keep-buffers
 * ((ts, id, cents) of the last `keep` elements seen so far). */
case class EvictState(open: List[(Long, List[(Long, Long, Long)])])

/** Finalized evictor window for the event_type-keyed variants. */
case class EvictTypeWinRow(event_type: String, ws_us: Long, n_kept: Long, kept_cents: Long)

/**
 * Window EVICTORS (reference
 * `streaming/api/windowing/evictors/CountEvictor.java` via
 * `WindowedStream.evictor`): the window's aggregate applies to only a
 * retained subset of its buffer. This is the CountEvictor — keep the
 * LAST `keep` elements in event-time order — fused with a tumbling
 * event-time window aggregate.
 *
 * Mechanics: per (key, window) the state holds AT MOST `keep` rows (a
 * sorted bounded buffer — inserting an element evicts the oldest
 * beyond `keep`, which is exactly the evictor's contract applied
 * eagerly); a window emits once the watermark passes its end, then its
 * buffer drops. Rows whose window is already finalized are dropped on
 * entry (the late-element rule — re-opening the window would re-emit
 * it). End-of-input finalize comes from the keyed-sentinel harness
 * (sentinel rows, event_id < 0, advance the watermark and invoke the
 * key without entering any buffer).
 *
 * Scale: state per key = open-windows × keep rows — both bounded (the
 * evictor's whole point: a count-evicted window never buffers the full
 * window contents).
 */
object Evictors {

  def tumbleCountEvictor(ds: Dataset[Ev], sizeUs: Long, keep: Int,
      watermarkDelay: String = "0 seconds",
      ttl: Option[String] = None): Dataset[EvictWinRow] = {
    import ds.sparkSession.implicits._
    Ttl.guard(ttl, watermarkDelay)
    require(keep >= 1, "need keep >= 1")
    val withWm = ds.toDF()
      .withColumn("__event_ts", timestamp_micros(col("ts_us")))
      .withWatermark("__event_ts", watermarkDelay)
      .as[Ev]
    withWm.groupByKey(_.user_id)
      .flatMapGroupsWithState[EvictState, EvictWinRow](
          OutputMode.Append, Ttl.timeoutConf(ttl))(Ttl.wrap(ttl) {
        (key, it, state: GroupState[EvictState]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          var open = state.getOption.fold(Map.empty[Long, List[(Long, Long, Long)]])(_.open.toMap)
          it.filter(_.event_id >= 0).foreach { e =>
            val ws = Math.floorDiv(e.ts_us, sizeUs) * sizeUs
            // a row for an already-finalized window is late — dropping
            // it mirrors the reference; re-opening would double-emit
            if (ws + sizeUs > wmUs) {
              val buf = (e.ts_us, e.event_id, math.floor(e.value * 100).toLong) :: open.getOrElse(ws, Nil)
              open += ws -> buf.sortBy(r => (r._1, r._2)).takeRight(keep)
            }
          }
          val (done, still) = open.partition { case (ws, _) => ws + sizeUs <= wmUs }
          state.update(EvictState(still.toList))
          done.toList.sortBy(_._1).map { case (ws, rows) =>
            EvictWinRow(key, ws, rows.size.toLong, rows.map(_._3).sum)
          }.iterator
      })
  }

  /**
   * TIME EVICTOR (reference
   * `streaming/api/windowing/evictors/TimeEvictor.java:69-84`): at
   * window firing, elements with `ts <= max_ts − keepSpan` are evicted
   * — the aggregate sees only the trailing `keepSpan` of event time.
   *
   * The cutoff `max_ts − keepSpan` is monotone in `max_ts`, so the
   * eviction applies EAGERLY on every insert: an element below an
   * earlier cutoff is below every later one. State per (key, window)
   * is therefore bounded by the data density of one `keepSpan`, not
   * the window size. Keyed by event_type (few hot keys — at scale any
   * higher-cardinality key column works identically); windows close
   * via event-time timeout once the watermark passes their end.
   */
  def tumbleTimeEvictor(ds: Dataset[Ev], sizeUs: Long, keepUs: Long,
      watermarkDelay: String = "0 seconds"): Dataset[EvictTypeWinRow] = {
    import ds.sparkSession.implicits._
    require(keepUs >= 1 && sizeUs >= 1, "need positive window and keep span")
    val withWm = ds.toDF()
      .withColumn("__event_ts", timestamp_micros(col("ts_us")))
      .withWatermark("__event_ts", watermarkDelay)
      .as[Ev]
    withWm.groupByKey(_.event_type)
      .flatMapGroupsWithState[EvictState, EvictTypeWinRow](
          OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key, it, state: GroupState[EvictState]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          var open = state.getOption.fold(Map.empty[Long, List[(Long, Long, Long)]])(_.open.toMap)
          it.filter(_.event_id >= 0).foreach { e =>
            val ws = Math.floorDiv(e.ts_us, sizeUs) * sizeUs
            if (ws + sizeUs > wmUs) {
              val buf = (e.ts_us, e.event_id, math.floor(e.value * 100).toLong) :: open.getOrElse(ws, Nil)
              val cutoff = buf.iterator.map(_._1).max - keepUs
              open += ws -> buf.filter(_._1 > cutoff)
            }
          }
          val (done, still) = open.partition { case (ws, _) => ws + sizeUs <= wmUs }
          if (still.isEmpty) state.remove()
          else {
            state.update(EvictState(still.toList))
            val nextMs = (still.keysIterator.map(_ + sizeUs).min + 999) / 1000
            state.setTimeoutTimestamp(math.max(nextMs, state.getCurrentWatermarkMs() + 1))
          }
          done.toList.sortBy(_._1).map { case (ws, rows) =>
            EvictTypeWinRow(key, ws, rows.size.toLong, rows.map(_._3).sum)
          }.iterator
      }
  }

  /**
   * DELTA EVICTOR (reference
   * `streaming/api/windowing/evictors/DeltaEvictor.java:74-83`): at
   * window firing, every element whose delta against the buffer's LAST
   * element reaches `threshold` is evicted; the aggregate sees only
   * elements within the threshold of the last one. Delta here is the
   * absolute integer-cent difference (any `DeltaFunction` slots in).
   *
   * Unlike the count/time evictors the cutoff depends on the FINAL
   * last element, so the buffer must hold the whole open window — the
   * same cost the reference pays (its evictor windows keep the full
   * pane as a ListState). Last = max (ts, id), the event-time order
   * the buffer finalizes in.
   */
  def tumbleDeltaEvictor(ds: Dataset[Ev], sizeUs: Long, thresholdCents: Long,
      watermarkDelay: String = "0 seconds"): Dataset[EvictTypeWinRow] = {
    import ds.sparkSession.implicits._
    require(thresholdCents >= 1 && sizeUs >= 1, "need positive window and threshold")
    val withWm = ds.toDF()
      .withColumn("__event_ts", timestamp_micros(col("ts_us")))
      .withWatermark("__event_ts", watermarkDelay)
      .as[Ev]
    withWm.groupByKey(_.event_type)
      .flatMapGroupsWithState[EvictState, EvictTypeWinRow](
          OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key, it, state: GroupState[EvictState]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          var open = state.getOption.fold(Map.empty[Long, List[(Long, Long, Long)]])(_.open.toMap)
          it.filter(_.event_id >= 0).foreach { e =>
            val ws = Math.floorDiv(e.ts_us, sizeUs) * sizeUs
            if (ws + sizeUs > wmUs)
              open += ws -> ((e.ts_us, e.event_id, math.floor(e.value * 100).toLong) :: open.getOrElse(ws, Nil))
          }
          val (done, still) = open.partition { case (ws, _) => ws + sizeUs <= wmUs }
          if (still.isEmpty) state.remove()
          else {
            state.update(EvictState(still.toList))
            val nextMs = (still.keysIterator.map(_ + sizeUs).min + 999) / 1000
            state.setTimeoutTimestamp(math.max(nextMs, state.getCurrentWatermarkMs() + 1))
          }
          done.toList.sortBy(_._1).map { case (ws, rows) =>
            val lastCents = rows.maxBy(r => (r._1, r._2))._3
            val kept = rows.filter(r => math.abs(r._3 - lastCents) < thresholdCents)
            EvictTypeWinRow(key, ws, kept.size.toLong, kept.map(_._3).sum)
          }.iterator
      }
  }
}
