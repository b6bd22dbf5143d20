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
}
