package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.{col, timestamp_micros}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One closed count window: `win_idx` is the per-key 1-based window
 * number, `win_cents` the integer-cent sum of its `n_rows` rows. */
case class CountWindowRow(user_id: Long, win_idx: Long, n_rows: Long, win_cents: Long)
case class CountSlideRow(user_id: Long, fire_idx: Long, n_rows: Long, win_cents: Long)
case class CountSlideState(pending: List[Ev], released: Long, ring: List[Long])

/** One closed dynamic-gap session: [ws_us, we_us) where we_us is the
 * max over session rows of ts + gap(row). */
case class DynSessionRow(user_id: Long, ws_us: Long, we_us: Long, n: Long, sum_cents: Long)

/** State for [[CountSession.countWindow]]: watermark-held rows plus the
 * released-row count and the open window's partial cent sum. */
case class CountWindowState(pending: List[Ev], released: Long, openCents: Long)

/** State for [[CountSession.sessionDynamic]]: watermark-held rows plus
 * the open session (ws, close boundary, n, cents), if any. */
case class DynSessionState(pending: List[Ev], open: Option[(Long, Long, Long, Long)])

/**
 * Count windows and dynamic-gap sessions as keyed state operators —
 * the two window assigners Spark's `window`/`session_window` surface
 * does not cover:
 *
 *  - [[countWindow]] → the reference's `KeyedStream.countWindow`
 *    (`datastream/KeyedStream.java:771`: GlobalWindows +
 *    purging CountTrigger): every Nth row closes a window; a trailing
 *    incomplete window never fires, exactly like the purging count
 *    trigger.
 *  - [[sessionDynamic]] → the reference's
 *    `assigners/DynamicEventTimeSessionWindows.java` with a
 *    `SessionWindowTimeGapExtractor`: each row extends its session to
 *    ts + gap(row); a row at or past the session's close boundary
 *    starts a new one (same merge rule as Spark's batch
 *    `session_window` with a gap expression, so one SQL oracle covers
 *    both engines).
 *
 * Both release rows in (ts, event_id) order only once the watermark
 * STRICTLY passes them (same peer-safety argument as
 * [[BoundedOver]]), so results are independent of micro-batch
 * boundaries. Driven by the keyed-sentinel harness: sentinel rows
 * (event_id < 0) advance the watermark and invoke every key but are
 * never buffered. State per key is O(pending-within-watermark-delay)
 * plus O(1) window accumulators — watermark-bounded, the 100-TB keyed
 * state requirement.
 */
object CountSession {

  private def cents(e: Ev): Long = math.floor(e.value * 100).toLong

  def countWindow(ds: Dataset[Ev], n: Int,
      watermarkDelay: String = "0 seconds",
      ttl: Option[String] = None): Dataset[CountWindowRow] = {
    import ds.sparkSession.implicits._
    Ttl.guard(ttl, watermarkDelay)
    val withWm = ds.toDF()
      .withColumn("__event_ts", timestamp_micros(col("ts_us")))
      .withWatermark("__event_ts", watermarkDelay)
      .as[Ev]
    withWm.groupByKey(_.user_id)
      .flatMapGroupsWithState[CountWindowState, CountWindowRow](
          OutputMode.Append, Ttl.timeoutConf(ttl))(Ttl.wrap(ttl) {
        (key, it, state: GroupState[CountWindowState]) =>
          val st = state.getOption.getOrElse(CountWindowState(Nil, 0L, 0L))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val all = (st.pending ++ it.filter(_.event_id >= 0))
            .sortBy(e => (e.ts_us, e.event_id))
          val (ready, pending) = all.partition(_.ts_us < wmUs)
          var released = st.released
          var acc = st.openCents
          val out = List.newBuilder[CountWindowRow]
          ready.foreach { e =>
            released += 1
            acc += cents(e)
            if (released % n == 0) {
              out += CountWindowRow(key, released / n, n.toLong, acc)
              acc = 0L
            }
          }
          state.update(CountWindowState(pending, released, acc))
          out.result().iterator
      })
  }

  /** SLIDING count window (reference `countWindow(size, slide)` =
   * GlobalWindow + CountEvictor(size) + CountTrigger(slide)): fires
   * every `slide` released rows, each firing aggregating the last
   * min(size, released) rows. Same strict watermark-ordered release
   * discipline as [[countWindow]]; state adds only an O(size) ring of
   * the most recent per-row values. */
  def countWindowSliding(ds: Dataset[Ev], size: Int, slide: Int,
      watermarkDelay: String = "0 seconds",
      ttl: Option[String] = None): Dataset[CountSlideRow] = {
    import ds.sparkSession.implicits._
    require(size > 0 && slide > 0, "size and slide must be positive")
    Ttl.guard(ttl, watermarkDelay)
    val withWm = ds.toDF()
      .withColumn("__event_ts", timestamp_micros(col("ts_us")))
      .withWatermark("__event_ts", watermarkDelay)
      .as[Ev]
    withWm.groupByKey(_.user_id)
      .flatMapGroupsWithState[CountSlideState, CountSlideRow](
          OutputMode.Append, Ttl.timeoutConf(ttl))(Ttl.wrap(ttl) {
        (key, it, state: GroupState[CountSlideState]) =>
          val st = state.getOption.getOrElse(CountSlideState(Nil, 0L, Nil))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val all = (st.pending ++ it.filter(_.event_id >= 0))
            .sortBy(e => (e.ts_us, e.event_id))
          val (ready, pending) = all.partition(_.ts_us < wmUs)
          var released = st.released
          var ring = st.ring // newest last, at most `size` entries
          val out = List.newBuilder[CountSlideRow]
          ready.foreach { e =>
            released += 1
            ring = (ring :+ cents(e)).takeRight(size)
            if (released % slide == 0)
              out += CountSlideRow(key, released / slide, ring.length.toLong, ring.sum)
          }
          state.update(CountSlideState(pending, released, ring))
          out.result().iterator
      })
  }

  def sessionDynamic(ds: Dataset[Ev], gapUs: Ev => Long,
      watermarkDelay: String = "0 seconds",
      ttl: Option[String] = None): Dataset[DynSessionRow] = {
    import ds.sparkSession.implicits._
    Ttl.guard(ttl, watermarkDelay)
    val withWm = ds.toDF()
      .withColumn("__event_ts", timestamp_micros(col("ts_us")))
      .withWatermark("__event_ts", watermarkDelay)
      .as[Ev]
    withWm.groupByKey(_.user_id)
      .flatMapGroupsWithState[DynSessionState, DynSessionRow](
          OutputMode.Append, Ttl.timeoutConf(ttl))(Ttl.wrap(ttl) {
        (key, it, state: GroupState[DynSessionState]) =>
          val st = state.getOption.getOrElse(DynSessionState(Nil, None))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val all = (st.pending ++ it.filter(_.event_id >= 0))
            .sortBy(e => (e.ts_us, e.event_id))
          val (ready, pending) = all.partition(_.ts_us < wmUs)
          val out = List.newBuilder[DynSessionRow]
          var open = st.open
          ready.foreach { e =>
            val end = e.ts_us + gapUs(e)
            open = open match {
              // extend: strictly before the close boundary (a row AT the
              // boundary starts a new session, the session_window rule)
              case Some((ws, we, cnt, sum)) if e.ts_us < we =>
                Some((ws, math.max(we, end), cnt + 1, sum + cents(e)))
              case Some(closed) =>
                out += DynSessionRow(key, closed._1, closed._2, closed._3, closed._4)
                Some((e.ts_us, end, 1L, cents(e)))
              case None =>
                Some((e.ts_us, end, 1L, cents(e)))
            }
          }
          // the open session closes once the watermark passes its
          // boundary: every future admissible row has ts >= watermark
          // >= boundary and so would start a new session
          open match {
            case Some((ws, we, cnt, sum)) if we <= wmUs =>
              out += DynSessionRow(key, ws, we, cnt, sum)
              open = None
            case _ => ()
          }
          state.update(DynSessionState(pending, open))
          out.result().iterator
      })
  }
}
