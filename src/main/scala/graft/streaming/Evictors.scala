package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.{col, timestamp_micros}
import org.apache.spark.sql.streaming.{GroupState, OutputMode}

/** One finalized evictor window: the kept-element count and their
 * integer-cent sum. */
case class EvictWinRow(user_id: Long, ws_us: Long, n_kept: Long, kept_cents: Long)

/** Per-key state: open windows → their bounded keep-buffers
 * ((ts, id, cents) of the last `keep` elements seen so far). */
case class EvictState(open: List[(Long, List[(Long, Long, Long)])])

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
}
