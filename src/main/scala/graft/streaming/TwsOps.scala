package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/**
 * Arbitrary-state v2 (`transformWithState`, Spark 4) variants of the
 * stateful operators — the modern engine-native form of the reference's
 * keyed-state operators, including state TTL (reference
 * `StateTtlConfig.java:51`): the winner entry auto-expires after the
 * configured idle duration, exactly like the reference's
 * `cleanupInRocksdbCompactFilter` retention. Requires the RocksDB state
 * store provider (the API is provider-gated in Spark 4.1).
 */
/** Per-key Top-N state: the key travels IN the value so savepoint
 * seed projections stay key-struct-agnostic. */
case class TopNBuf(event_type: String, rows: List[Ev])

object TwsOps {

  /** Keep-last dedup as a StatefulProcessor with TTL'd ValueState. */
  class KeepLastProcessor(ttl: TTLConfig) extends StatefulProcessor[Long, Ev, Ev] {
    @transient private var winner: ValueState[Ev] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      winner = getHandle.getValueState[Ev]("winner", Encoders.product[Ev], ttl)

    override def handleInputRows(key: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[Ev] = {
      val prev = if (winner.exists()) Some(winner.get()) else None
      val cand = (prev.iterator ++ rows).maxBy(e => (e.ts_us, e.event_id))
      val changed = prev.forall(o => (o.ts_us, o.event_id) != (cand.ts_us, cand.event_id))
      winner.update(cand)
      if (changed) Iterator.single(cand) else Iterator.empty
    }
  }

  /** Streaming keep-last per user on transformWithState; state entries
   * expire after `ttl` of inactivity (TTLConfig.NONE → keep forever). */
  def keepLastByUser(ds: Dataset[Ev], ttl: TTLConfig = TTLConfig.NONE): Dataset[Ev] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .transformWithState(new KeepLastProcessor(ttl), TimeMode.None(), OutputMode.Update())
  }

  /** [[KeepLastProcessor]] with savepoint seeding: restored winners
   * behave exactly like live ones (a later event must be strictly
   * newer to displace them, and seeding emits nothing). */
  class KeepLastProcessorSeeded(ttl: TTLConfig)
      extends StatefulProcessorWithInitialState[Long, Ev, Ev, Ev] {
    @transient private var winner: ValueState[Ev] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      winner = getHandle.getValueState[Ev]("winner", Encoders.product[Ev], ttl)

    override def handleInitialState(key: Long, initial: Ev,
        timerValues: TimerValues): Unit =
      winner.update(initial)

    override def handleInputRows(key: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[Ev] = {
      val prev = if (winner.exists()) Some(winner.get()) else None
      val cand = (prev.iterator ++ rows).maxBy(e => (e.ts_us, e.event_id))
      val changed = prev.forall(o => (o.ts_us, o.event_id) != (cand.ts_us, cand.event_id))
      winner.update(cand)
      if (changed) Iterator.single(cand) else Iterator.empty
    }
  }

  /** Keep-last resumed from a savepoint frame (see
   * [[graft.streaming.Rescale]] for the read side). */
  def keepLastByUserSeeded(ds: Dataset[Ev], initial: Dataset[Ev],
      ttl: TTLConfig = TTLConfig.NONE): Dataset[Ev] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .transformWithState(new KeepLastProcessorSeeded(ttl),
        TimeMode.None(), OutputMode.Update(), initial.groupByKey(_.user_id))
  }

  /** Keyed Top-N buffer as a StatefulProcessor WITH savepoint seeding:
   * per event_type, the current top-n rows by (value desc, event_id).
   * The state value carries its key (`event_type`), so the savepoint
   * seed projection needs no key-struct knowledge — the shape the
   * generic [[graft.streaming.Rescale.savepointRead]] path expects.
   * Emission: a row is emitted when it ENTERS the buffer; the final
   * image downstream is a re-rank over all emitted rows (every true
   * top-n row enters the buffer on arrival, so it is always emitted).
   * State per key is exactly n rows — bounded. */
  class TopNProcessor(n: Int)
      extends StatefulProcessorWithInitialState[String, Ev, Ev, TopNBuf] {
    @transient private var buf: ValueState[TopNBuf] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      buf = getHandle.getValueState[TopNBuf]("topn",
        Encoders.product[TopNBuf], TTLConfig.NONE)

    override def handleInitialState(key: String, initial: TopNBuf,
        timerValues: TimerValues): Unit =
      buf.update(TopNBuf(key,
        initial.rows.sortBy(e => (-e.value, e.event_id)).take(n)))

    override def handleInputRows(key: String, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[Ev] = {
      val prev = if (buf.exists()) buf.get().rows else Nil
      val merged = (prev ++ rows).sortBy(e => (-e.value, e.event_id)).take(n)
      buf.update(TopNBuf(key, merged))
      val prevIds = prev.map(_.event_id).toSet
      merged.iterator.filterNot(e => prevIds(e.event_id))
    }
  }

  /** Streaming top-n per event_type on transformWithState, seeded from
   * a savepoint frame (empty frame → fresh start). */
  def topNByTypeSeeded(ds: Dataset[Ev], initial: Dataset[TopNBuf],
      n: Int = 3): Dataset[Ev] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.event_type)
      .transformWithState(new TopNProcessor(n), TimeMode.None(),
        OutputMode.Update(), initial.groupByKey(_.event_type))
  }
}
