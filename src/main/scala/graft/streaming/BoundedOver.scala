package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions.{col, timestamp_micros}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import scala.reflect.runtime.universe.TypeTag

/** Output row of the event-time bounded OVER: the input row's identity
 * plus its frame aggregate (row count + integer-cent sum). */
case class BoundedOverRow(user_id: Long, event_id: Long, frame_n: Long, frame_cents: Long)

/** Generic bounded-OVER output: the input row plus its frame aggregate. */
case class BoundedOverRowG[T](row: T, frame_n: Long, frame_cents: Long)

/** Per-key state: rows newer than the watermark (not yet released) plus
 * the released-row history a future frame can still reference — last N
 * rows for ROWS frames, the range horizon for RANGE frames. */
case class BoundedOverStateG[T](pending: List[T], history: List[T])

/**
 * Event-time bounded streaming OVER aggregation — the reference's
 * `over/RowTimeRowsBoundedPrecedingFunction.java` (ROWS BETWEEN n
 * PRECEDING AND CURRENT ROW) and
 * `over/RowTimeRangeBoundedPrecedingFunction.java` (RANGE BETWEEN
 * interval PRECEDING AND CURRENT ROW), keyed per partition key.
 *
 * Generic over the event type (the reference functions are
 * RowData-generic): key/time/id/value are field names of any case
 * class, the `Cep.runBoundBy` recipe. The aggregated value is
 * floor-quantized to integer cents (`floor(value * 100)`) — the repo's
 * exact cross-engine summation convention.
 *
 * Mechanics (same as the reference's watermark-timer design): incoming
 * rows buffer in keyed state; when the watermark passes a row's event
 * time it is released in (time, id) order and its frame is computed
 * from the retained history. Release is driven by
 * `GroupStateTimeout.EventTimeTimeout` — each key arms a timer at its
 * earliest pending timestamp, so buffered rows flush even when the key
 * receives no further input (the reference registers an event-time
 * timer per pending timestamp).
 *
 * Scale: state per key is O(pending-within-watermark-delay) + O(N) for
 * ROWS / O(rows-in-range-horizon) for RANGE — both watermark-bounded.
 * ROWS frames order by (time, id) — a unique total order, so results
 * are deterministic; RANGE frames include same-ts peers, per SQL RANGE
 * semantics.
 */
object BoundedOver {

  sealed trait Frame
  /** ROWS BETWEEN `preceding` PRECEDING AND CURRENT ROW. */
  final case class RowsFrame(preceding: Int) extends Frame
  /** RANGE BETWEEN `rangeUs` microseconds PRECEDING AND CURRENT ROW. */
  final case class RangeFrame(rangeUs: Long) extends Frame

  def runBy[T <: Product : TypeTag](ds: Dataset[T], keyField: String,
      timeField: String, idField: String, valueField: String, frame: Frame,
      watermarkDelay: String = "0 seconds"): Dataset[BoundedOverRowG[T]] = {
    implicit val tEnc: Encoder[T] = Encoders.product[T]
    implicit val stEnc: Encoder[BoundedOverStateG[T]] = Encoders.product[BoundedOverStateG[T]]
    implicit val outEnc: Encoder[BoundedOverRowG[T]] = Encoders.product[BoundedOverRowG[T]]
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    val schema = tEnc.schema
    val (ki, ti, ii, vi) = (schema.fieldIndex(keyField), schema.fieldIndex(timeField),
      schema.fieldIndex(idField), schema.fieldIndex(valueField))
    val key: T => String = t => String.valueOf(t.productElement(ki))
    val time: T => Long = t => t.productElement(ti).asInstanceOf[Number].longValue
    val id: T => Long = t => t.productElement(ii).asInstanceOf[Number].longValue
    val cents: T => Long =
      t => math.floor(t.productElement(vi).asInstanceOf[Number].doubleValue * 100).toLong

    val withWm = ds.toDF()
      .withColumn("__event_ts", timestamp_micros(col(timeField)))
      .withWatermark("__event_ts", watermarkDelay)
      .as[T]
    withWm.groupByKey(key)
      .flatMapGroupsWithState[BoundedOverStateG[T], BoundedOverRowG[T]](
          OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_, it, state: GroupState[BoundedOverStateG[T]]) =>
          val st = state.getOption.getOrElse(BoundedOverStateG[T](Nil, Nil))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val all = (st.pending ++ it).sortBy(e => (time(e), id(e)))
          // Strict release: a row at ts == watermark is held until the
          // watermark passes it, because Spark still ADMITS rows at the
          // watermark — releasing it now could split a RANGE peer group
          // across batches (a later-arriving same-ts peer would get a
          // different frame than the one already emitted).
          val (ready, pending) = all.partition(e => time(e) < wmUs)
          var hist = st.history // ascending (time, id), all released
          val out = List.newBuilder[BoundedOverRowG[T]]
          frame match {
            case RowsFrame(p) =>
              ready.foreach { e =>
                val fr = hist.takeRight(p) :+ e
                out += BoundedOverRowG(e, fr.size.toLong, fr.map(cents).sum)
                hist = (hist :+ e).takeRight(p)
              }
            case RangeFrame(r) =>
              // same-ts peers share one frame that includes the whole group
              ready.groupBy(time).toList.sortBy(_._1).foreach { case (t, rows) =>
                hist = hist ++ rows
                val fr = hist.filter(e => time(e) >= t - r)
                val (n, c) = (fr.size.toLong, fr.map(cents).sum)
                rows.foreach(e => out += BoundedOverRowG(e, n, c))
              }
              // future rows arrive at ts >= watermark; their frames reach
              // back at most `r`
              hist = hist.filter(e => time(e) >= wmUs - r)
          }
          state.update(BoundedOverStateG(pending, hist))
          if (pending.nonEmpty) {
            val nextMs = (pending.map(time).min + 999) / 1000
            state.setTimeoutTimestamp(math.max(nextMs, state.getCurrentWatermarkMs() + 1))
          }
          out.result().iterator
      }
  }

  /** Ev-fixture shim over [[runBy]] (the original entry). */
  def run(ds: Dataset[Ev], frame: Frame,
      watermarkDelay: String = "0 seconds"): Dataset[BoundedOverRow] = {
    import ds.sparkSession.implicits._
    runBy(ds, "user_id", "ts_us", "event_id", "value", frame, watermarkDelay)
      .map(g => BoundedOverRow(g.row.user_id, g.row.event_id, g.frame_n, g.frame_cents))
  }
}
