package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions.{col, timestamp_micros}
import org.apache.spark.sql.streaming.{GroupState, OutputMode}

/** Tagged two-input envelope: exactly one of `a`/`b` is set (the other
 * null), `side` says which. Kryo-encoded so A and B stay fully generic. */
case class CoIn[A, B](side: Int, key: Long, ts_us: Long, id: Long, a: A, b: B)

/** Keyed co-process state: the pending two-sided buffer plus the
 * user's shared per-key state. */
case class CoProcState[A, B, S](pending: List[CoIn[A, B]], user: S)

/**
 * Connected streams — the reference's two-input operator surface
 * (`flink-streaming-java/.../datastream/ConnectedStreams.java:60`,
 * `functions/co/CoFlatMapFunction.java:45`,
 * `functions/co/KeyedCoProcessFunction.java:48`): two streams of
 * DIFFERENT element types share one operator (and, when keyed, one
 * per-key state), with a processElement1/processElement2 callback pair.
 *
 * Spark has no two-input stateful operator, so both inputs are
 * union-TAGGED through a [[CoIn]] envelope into a single
 * `flatMapGroupsWithState` — the same mapping the streaming windowed
 * coGroup uses. Each leg takes its own watermark BEFORE the union;
 * Spark's global watermark is the minimum of the two, exactly the
 * reference's two-input watermark rule
 * (`AbstractStreamOperator.processWatermark1/2` min-combining).
 *
 * Two entry points:
 *  - [[coFlatMap]]: the stateless CoFlatMap/CoMap pair — per-element
 *    callbacks in arrival order, no cross-input ordering contract
 *    (same as the reference: connect + flatMap gives no order).
 *  - [[keyedCoProcessOrdered]]: KeyedCoProcessFunction with
 *    EVENT-TIME-ORDERED delivery — elements buffer per key and release
 *    in (ts, side, id) order as the watermark strictly passes them
 *    (side 1 before side 2 on timestamp ties), so the cross-input
 *    interleaving both callbacks observe is deterministic and
 *    oracle-checkable. The reference achieves the same discipline
 *    inside a KeyedCoProcessFunction with buffered state + event-time
 *    timers (its docs' canonical pattern); here the buffer/timer
 *    half is built in. Rows with id < 0 are watermark carriers
 *    (sentinels): they advance the watermark but never enter state.
 *    Sentinels are OPTIONAL — when no TTL is set, each key arms an
 *    event-time timer at its earliest pending row, so buffered rows
 *    drain as the global watermark advances even for keys that never
 *    receive further input. A key's trailing rows still need the
 *    GLOBAL watermark to pass them (some source must keep producing,
 *    or a final sentinel on either leg closes the stream) — the same
 *    contract as the reference's min-combined two-input watermark.
 *
 * Scale: one shuffle on the shared key for both inputs together;
 * state per key is the user state plus only the rows still above the
 * watermark (strict release drains the buffer as the watermark moves).
 */
object ConnectedOps {

  /** Stateless connect: flatMap1 over the first input, flatMap2 over
   * the second, one output stream (reference CoFlatMapFunction). */
  def coFlatMap[A, B, O](a: Dataset[A], b: Dataset[B],
      f1: A => IterableOnce[O], f2: B => IterableOnce[O])(
      implicit oEnc: Encoder[O]): Dataset[O] =
    a.flatMap(f1).union(b.flatMap(f2))

  /** Keyed co-process with event-time-ordered delivery (reference
   * KeyedCoProcessFunction over buffered state + event-time timers).
   * `on1`/`on2` see (key, shared state, element) and return the new
   * state plus emissions; elements are delivered in (ts, side, id)
   * order once the watermark strictly passes their timestamp. */
  def keyedCoProcessOrdered[A, B, S, O](
      a: Dataset[A], keyA: A => Long, tsA: A => Long, idA: A => Long,
      b: Dataset[B], keyB: B => Long, tsB: B => Long, idB: B => Long,
      zero: S,
      on1: (Long, S, A) => (S, Seq[O]),
      on2: (Long, S, B) => (S, Seq[O]),
      watermarkDelay: String = "0 seconds",
      ttl: Option[String] = None)(
      implicit aEnc: Encoder[A], bEnc: Encoder[B], oEnc: Encoder[O]): Dataset[O] = {
    Ttl.guard(ttl, watermarkDelay)
    implicit val envEnc: Encoder[CoIn[A, B]] = Encoders.kryo[CoIn[A, B]]
    implicit val tsEnvEnc: Encoder[(java.sql.Timestamp, CoIn[A, B])] =
      Encoders.tuple(Encoders.TIMESTAMP, envEnc)
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    implicit val stEnc: Encoder[CoProcState[A, B, S]] =
      Encoders.kryo[CoProcState[A, B, S]]

    // each leg's watermark comes from its own rows (assigned before
    // the union), through the (time, payload) envelope so the event
    // time is a real column — the runBoundByF convention
    def leg[T](ds: Dataset[T], ts: T => Long, wrap: T => CoIn[A, B])(
        implicit tEnc: Encoder[T]): Dataset[(java.sql.Timestamp, CoIn[A, B])] = {
      implicit val rawEnc: Encoder[(Long, CoIn[A, B])] =
        Encoders.tuple(Encoders.scalaLong, envEnc)
      ds.map(t => (ts(t), wrap(t)))
        .toDF()
        .select(timestamp_micros(col("_1")).as("_1"), col("_2"))
        .withWatermark("_1", watermarkDelay)
        .as[(java.sql.Timestamp, CoIn[A, B])]
    }
    val legA = leg(a, tsA,
      (t: A) => CoIn[A, B](0, keyA(t), tsA(t), idA(t), t, null.asInstanceOf[B]))
    val legB = leg(b, tsB,
      (t: B) => CoIn[A, B](1, keyB(t), tsB(t), idB(t), null.asInstanceOf[A], t))

    val body = (k: Long, it: Iterator[(java.sql.Timestamp, CoIn[A, B])],
        state: GroupState[CoProcState[A, B, S]]) => {
      val st0 = state.getOption.getOrElse(CoProcState[A, B, S](Nil, zero))
      val arrivals = it.map(_._2).filter(_.id >= 0).toList
      val buf = st0.pending ++ arrivals
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      // strict release: a row releases only once the watermark is
      // PAST its timestamp, so every ts-peer (either side) has
      // arrived — the same peer-safety argument as sortedEmit
      val (ready, pending) = buf.partition(_.ts_us < wmUs)
      var user = st0.user
      val out = List.newBuilder[O]
      ready.sortBy(e => (e.ts_us, e.side, e.id)).foreach { e =>
        val (next, emits) =
          if (e.side == 0) on1(k, user, e.a) else on2(k, user, e.b)
        user = next
        out ++= emits
      }
      state.update(CoProcState(pending, user))
      // without a TTL, arm an event-time timer at the earliest pending
      // row, so the buffer drains when the GLOBAL watermark advances
      // even if this key never sees another input — the reference's
      // event-time-timer half of the buffered co-process pattern.
      // (With a TTL the operator runs on processing-time timeouts
      // instead, and an idle key's state expires wholesale.)
      if (ttl.isEmpty && pending.nonEmpty)
        state.setTimeoutTimestamp(math.max(
          state.getCurrentWatermarkMs() + 1,
          pending.map(_.ts_us).min / 1000L + 1))
      out.result().iterator
    }
    val timedBody =
      if (ttl.isDefined) Ttl.wrap(ttl)(body)
      else (k: Long, it: Iterator[(java.sql.Timestamp, CoIn[A, B])],
          state: GroupState[CoProcState[A, B, S]]) =>
        // a fired event-time timer is just a drain pass: empty input,
        // release whatever the watermark now covers
        body(k, if (state.hasTimedOut) Iterator.empty else it, state)
    legA.union(legB)
      .groupByKey(_._2.key)
      .flatMapGroupsWithState[CoProcState[A, B, S], O](
        OutputMode.Append,
        if (ttl.isDefined) Ttl.timeoutConf(ttl)
        else org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout)(
        timedBody)
  }
}
