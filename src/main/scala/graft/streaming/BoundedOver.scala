package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.{col, timestamp_micros}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Output row of the event-time bounded OVER: the input row's identity
 * plus its frame aggregate (row count + integer-cent sum). */
case class BoundedOverRow(user_id: Long, event_id: Long, frame_n: Long, frame_cents: Long)

/** Per-key state: rows newer than the watermark (not yet released) plus
 * the released-row history a future frame can still reference — last N
 * rows for ROWS frames, the range horizon for RANGE frames. */
case class BoundedOverState(pending: List[Ev], history: List[Ev])

/**
 * Event-time bounded streaming OVER aggregation — the reference's
 * `over/RowTimeRowsBoundedPrecedingFunction.java` (ROWS BETWEEN n
 * PRECEDING AND CURRENT ROW) and
 * `over/RowTimeRangeBoundedPrecedingFunction.java` (RANGE BETWEEN
 * interval PRECEDING AND CURRENT ROW), keyed per user.
 *
 * Mechanics (same as the reference's watermark-timer design): incoming
 * rows buffer in keyed state; when the watermark passes a row's event
 * time it is released in (ts, event_id) order and its frame is computed
 * from the retained history. Release is driven by
 * `GroupStateTimeout.EventTimeTimeout` — each key arms a timer at its
 * earliest pending timestamp, so buffered rows flush even when the key
 * receives no further input (the reference registers an event-time
 * timer per pending timestamp). Rows later than the watermark are
 * dropped on entry, as in the reference.
 *
 * Scale: state per key is O(pending-within-watermark-delay) + O(N) for
 * ROWS / O(rows-in-range-horizon) for RANGE — both watermark-bounded.
 * ROWS frames order by (ts, event_id) — a unique total order, so
 * results are deterministic; RANGE frames include same-ts peers, per
 * SQL RANGE semantics.
 */
object BoundedOver {

  sealed trait Frame
  /** ROWS BETWEEN `preceding` PRECEDING AND CURRENT ROW. */
  final case class RowsFrame(preceding: Int) extends Frame
  /** RANGE BETWEEN `rangeUs` microseconds PRECEDING AND CURRENT ROW. */
  final case class RangeFrame(rangeUs: Long) extends Frame

  private def cents(e: Ev): Long = math.floor(e.value * 100).toLong

  def run(ds: Dataset[Ev], frame: Frame,
      watermarkDelay: String = "0 seconds"): Dataset[BoundedOverRow] = {
    import ds.sparkSession.implicits._
    val withWm = ds.toDF()
      .withColumn("__event_ts", timestamp_micros(col("ts_us")))
      .withWatermark("__event_ts", watermarkDelay)
      .as[Ev]
    withWm.groupByKey(_.user_id)
      .flatMapGroupsWithState[BoundedOverState, BoundedOverRow](
          OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key, it, state: GroupState[BoundedOverState]) =>
          val st = state.getOption.getOrElse(BoundedOverState(Nil, Nil))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val all = (st.pending ++ it).sortBy(e => (e.ts_us, e.event_id))
          // Strict release: a row at ts == watermark is held until the
          // watermark passes it, because Spark still ADMITS rows at the
          // watermark — releasing it now could split a RANGE peer group
          // across batches (a later-arriving same-ts peer would get a
          // different frame than the one already emitted).
          val (ready, pending) = all.partition(_.ts_us < wmUs)
          var hist = st.history // ascending (ts, event_id), all released
          val out = List.newBuilder[BoundedOverRow]
          frame match {
            case RowsFrame(p) =>
              ready.foreach { e =>
                val fr = hist.takeRight(p) :+ e
                out += BoundedOverRow(key, e.event_id, fr.size.toLong, fr.map(cents).sum)
                hist = (hist :+ e).takeRight(p)
              }
            case RangeFrame(r) =>
              // same-ts peers share one frame that includes the whole group
              ready.groupBy(_.ts_us).toList.sortBy(_._1).foreach { case (t, rows) =>
                hist = hist ++ rows
                val fr = hist.filter(_.ts_us >= t - r)
                val (n, c) = (fr.size.toLong, fr.map(cents).sum)
                rows.foreach(e => out += BoundedOverRow(key, e.event_id, n, c))
              }
              // future rows arrive at ts >= watermark; their frames reach
              // back at most `r`
              hist = hist.filter(_.ts_us >= wmUs - r)
          }
          state.update(BoundedOverState(pending, hist))
          if (pending.nonEmpty) {
            val nextMs = (pending.map(_.ts_us).min + 999) / 1000
            state.setTimeoutTimestamp(math.max(nextMs, state.getCurrentWatermarkMs() + 1))
          }
          out.result().iterator
      }
  }
}
