package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import scala.reflect.runtime.universe.TypeTag

/** Per-key Top-N buffer for the generic [[StatefulOps.topNBy]]. */
case class TopNStateG[T](rows: List[T])

/** One Top-N buffer entry / output row. */
case class TopNRow(event_type: String, event_id: Long, value: Double)

/** Output of the per-key running aggregate (streaming OVER analog). */
case class RunningRow(user_id: Long, event_id: Long, running_n: Long, running_cents: Long)

/** Union-typed element for the control/data (broadcast state) pattern:
 * `isControl` rows carry a new threshold, data rows carry an event. */
case class Tagged(isControl: Boolean, event_type: String, threshold: Double,
    event_id: Long, user_id: Long, ts_us: Long, value: Double)

/** Row shape for the event-time sorted emission operator: `ts` is the
 * watermarked event-time column. */
case class TimedRow(key: Long, id: Long, ts: java.sql.Timestamp)

/** One Top-N changelog row: +I when a row enters the key's Top-N set,
 * -D when it is evicted; `out_seq` orders changes per key. */
case class TopNChange(row_kind: String, event_type: String, event_id: Long,
    value: Double, out_seq: Long)

/**
 * Stateful streaming operators on `flatMapGroupsWithState` (SURVEY.md
 * §7.2 "custom transformWithState processors", M3). Each mirrors a
 * reference runtime operator:
 *
 *  - keepLastByUser → `deduplicate/ProcTimeDeduplicateKeepLastRowFunction.java`
 *  - topNByType     → `rank/AppendOnlyTopNFunction.java:52`
 *  - runningByUser  → `over/ProcTimeUnboundedPrecedingFunction.java`
 *
 * Determinism: every comparator breaks ties on `event_id`, so results
 * are independent of arrival order inside a micro-batch. State per key
 * is O(1) (winner / N-element buffer / two counters) — the 100-TB
 * requirement for keyed state.
 */
object StatefulOps {

  /** Field getters by case-class field POSITION (product order ==
   * encoder schema order), so state-op closures capture plain ints —
   * the schema-driven recipe of `Cep.runBoundBy`. */
  private def fieldGetters[T <: Product](schema: org.apache.spark.sql.types.StructType,
      keyField: String, ordField: String, idField: String): (T => String, T => Long, T => Long) = {
    val (ki, oi, ii) =
      (schema.fieldIndex(keyField), schema.fieldIndex(ordField), schema.fieldIndex(idField))
    (t => String.valueOf(t.productElement(ki)),
      t => t.productElement(oi).asInstanceOf[Number].longValue,
      t => t.productElement(ii).asInstanceOf[Number].longValue)
  }

  /** Streaming keep-LAST deduplication over ANY case-class stream
   * (reference `deduplicate/ProcTimeDeduplicateKeepLastRowFunction.java`,
   * which is RowData-generic): one winner per key chosen by max
   * (time, id); emits the winner whenever it changes (update stream).
   * `dropDuplicates` covers keep-first natively; this covers the
   * keep-last half Spark lacks. */
  def keepLastBy[T <: Product : TypeTag](ds: Dataset[T],
      keyField: String, timeField: String, idField: String,
      ttl: Option[String] = None): Dataset[T] = {
    implicit val tEnc: Encoder[T] = Encoders.product[T]
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    val (key, time, id) = fieldGetters[T](tEnc.schema, keyField, timeField, idField)
    ds.groupByKey(key)
      .flatMapGroupsWithState[T, T](OutputMode.Update, Ttl.timeoutConf(ttl))(Ttl.wrap(ttl) {
        (_, it, state: GroupState[T]) =>
          val cand = (state.getOption.iterator ++ it).maxBy(e => (time(e), id(e)))
          val changed = state.getOption.forall(o => (time(o), id(o)) != (time(cand), id(cand)))
          state.update(cand)
          if (changed) Iterator.single(cand) else Iterator.empty
      })
  }

  /** Ev-fixture shim over [[keepLastBy]] (the original entry). */
  def keepLastByUser(ds: Dataset[Ev]): Dataset[Ev] =
    keepLastBy(ds, "user_id", "ts_us", "event_id")

  /** Streaming Top-N over ANY case-class stream (reference
   * `rank/AppendOnlyTopNFunction.java:52`, RowData-generic): per key
   * the N best rows by (value desc, id asc) in a bounded sorted state
   * buffer; emits the whole buffer when it changes (update stream —
   * the final Top-N is recoverable by re-ranking the distinct emitted
   * candidates, as the gates do). `valueField` must be numeric. */
  def topNBy[T <: Product : TypeTag](ds: Dataset[T], keyField: String,
      valueField: String, idField: String, n: Int,
      ttl: Option[String] = None): Dataset[T] = {
    implicit val tEnc: Encoder[T] = Encoders.product[T]
    implicit val stEnc: Encoder[TopNStateG[T]] = Encoders.product[TopNStateG[T]]
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    val schema = tEnc.schema
    val (ki, vi, ii) = (schema.fieldIndex(keyField),
      schema.fieldIndex(valueField), schema.fieldIndex(idField))
    val key: T => String = t => String.valueOf(t.productElement(ki))
    val value: T => Double = t => t.productElement(vi).asInstanceOf[Number].doubleValue
    val id: T => Long = t => t.productElement(ii).asInstanceOf[Number].longValue
    ds.groupByKey(key)
      .flatMapGroupsWithState[TopNStateG[T], T](OutputMode.Update, Ttl.timeoutConf(ttl))(Ttl.wrap(ttl) {
        (_, it, state: GroupState[TopNStateG[T]]) =>
          val old = state.getOption.fold(List.empty[T])(_.rows)
          val merged = (old.iterator ++ it).toList.distinct
            .sortBy(e => (-value(e), id(e)))
            .take(n)
          state.update(TopNStateG(merged))
          if (merged != old) merged.iterator else Iterator.empty
      })
  }

  /** Streaming Top-N per event_type by (value desc, event_id asc):
   * bounded N-element sorted buffer in state; emits the whole buffer
   * when it changes. The final Top-N is recoverable from the update
   * stream by re-ranking the distinct emitted candidates (see
   * StreamQueries) — the true top rows are always emitted. */
  def topNByType(ds: Dataset[Ev], n: Int): Dataset[TopNRow] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.event_type)
      .flatMapGroupsWithState[List[TopNRow], TopNRow](OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (k, it, state: GroupState[List[TopNRow]]) =>
          val old = state.getOption.getOrElse(Nil)
          val merged = (old.iterator ++ it.map(e => TopNRow(k, e.event_id, e.value)))
            .toList.distinct
            .sortBy(r => (-r.value, r.event_id))
            .take(n)
          state.update(merged)
          if (merged != old) merged.iterator else Iterator.empty
      }
  }

  /** Event-time sorted emission (reference stream sort,
   * `sort/RowTimeSortOperator.java`): rows buffer in keyed state and
   * are released in (ts, id) order only once the watermark passes them
   * — out-of-order arrivals are repaired up to the watermark bound.
   * The input must carry `withWatermark` on `ts`;
   * `GroupState.getCurrentWatermarkMs` is the release trigger the
   * reference drives with watermark timers. */
  def sortedEmit(ds: Dataset[TimedRow], ttl: Option[String] = None): Dataset[TimedRow] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[List[(Long, Long)], TimedRow](OutputMode.Append, Ttl.timeoutConf(ttl))(Ttl.wrap(ttl) {
        (k, it, state: GroupState[List[(Long, Long)]]) =>
          val buf = state.getOption.getOrElse(Nil) ++
            it.map(r => (r.ts.getTime, r.id))
          val wm = state.getCurrentWatermarkMs()
          // strict: a row AT the watermark is still admissible, and a
          // late same-ts peer with a smaller id would have to sort
          // BEFORE an already-emitted row — hold until the mark passes
          val (ready, pending) = buf.partition(_._1 < wm)
          state.update(pending)
          ready.sorted.map { case (t, id) => TimedRow(k, id, new java.sql.Timestamp(t)) }.iterator
      })
  }

  /** One watermark-released row of the indexed event-time sort: `idx`
   * is the per-key release position (1-based). */
  case class SortedRow(key: Long, id: Long, ts_us: Long, idx: Long)

  /** Event-time sort with a RELEASE INDEX (reference
   * `sort/RowTimeSortOperator.java`): rows buffer per key and release
   * in (ts, id) order once the watermark passes them, each stamped
   * with its per-key emission position — so the output order itself is
   * oracle-checkable, not just the membership. Sentinel rows
   * (event_id < 0, from the keyed-sentinel harness) advance the
   * watermark and invoke the key but are never buffered. */
  def sortedEmitIndexed(ds: Dataset[Ev],
      watermarkDelay: String = "0 seconds",
      ttl: Option[String] = None): Dataset[SortedRow] = {
    import ds.sparkSession.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    val withWm = ds.toDF()
      .withColumn("__event_ts", timestamp_micros(col("ts_us")))
      .withWatermark("__event_ts", watermarkDelay)
      .as[Ev]
    withWm.groupByKey(_.user_id)
      .flatMapGroupsWithState[(List[(Long, Long)], Long), SortedRow](
          OutputMode.Append, Ttl.timeoutConf(ttl))(Ttl.wrap(ttl) {
        (k, it, state: GroupState[(List[(Long, Long)], Long)]) =>
          val (buf0, idx0) = state.getOption.getOrElse((List.empty[(Long, Long)], 0L))
          val buf = buf0 ++ it.filter(_.event_id >= 0).map(e => (e.ts_us, e.event_id))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          // strict release — same peer-safety argument as sortedEmit
          val (ready, pending) = buf.partition(_._1 < wmUs)
          var idx = idx0
          val out = ready.sorted.map { case (t, id) =>
            idx += 1; SortedRow(k, id, t, idx)
          }
          state.update((pending, idx))
          out.iterator
      })
  }

  case class WmRow(event_id: Long, user_id: Long, ts_us: Long, wm_us: Option[Long])

  /** CURRENT_WATERMARK(rowtime) analog (reference FLIP-162,
   * `BuiltInFunctionDefinitions.CURRENT_WATERMARK`): stamp every row
   * with the operator's current event-time watermark, NULL before the
   * first watermark is emitted (the reference contract for a query
   * that has produced no watermark yet). The keyed state op exists
   * only to read the per-batch watermark — it holds no state, so the
   * keyspace costs nothing at scale. */
  def currentWatermark(ds: Dataset[Ev], watermarkDelay: String): Dataset[WmRow] = {
    import ds.sparkSession.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    val withWm = ds.toDF()
      .withColumn("__event_ts", timestamp_micros(col("ts_us")))
      .withWatermark("__event_ts", watermarkDelay)
      .as[Ev]
    withWm.groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, WmRow](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, it, state: GroupState[Long]) =>
          val wmMs = state.getCurrentWatermarkMs()
          val wm = if (wmMs > 0) Some(wmMs * 1000L) else None
          it.filter(_.event_id >= 0).map(e => WmRow(e.event_id, e.user_id, e.ts_us, wm))
      }
  }

  /** Control/data streams into one keyed state op (the reference's
   * broadcast-state / connected-streams pattern,
   * `KeyedBroadcastProcessFunction`): Spark state operators are
   * single-input, so the two streams are UNIONed with a type tag
   * (SURVEY §2.9's documented emulation). Control rows update the
   * per-event_type threshold kept in state; data rows pass iff
   * value >= the threshold current at their (ts, id) position. */
  def thresholdFilter(ds: Dataset[Tagged], ttl: Option[String] = None): Dataset[Ev] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.event_type)
      .flatMapGroupsWithState[Double, Ev](OutputMode.Append, Ttl.timeoutConf(ttl))(Ttl.wrap(ttl) {
        (k, it, state: GroupState[Double]) =>
          var thr = state.getOption.getOrElse(Double.NegativeInfinity)
          // controls sort before data at the same instant
          val out = it.toList.sortBy(r => (r.ts_us, !r.isControl, r.event_id)).flatMap { r =>
            if (r.isControl) { thr = r.threshold; Nil }
            else if (r.value >= thr) List(Ev(r.event_id, r.user_id, k, r.ts_us, r.value))
            else Nil
          }
          state.update(thr)
          out.iterator
      })
  }

  /** Streaming Top-N as a CHANGELOG (reference
   * `rank/AppendOnlyTopNFunction.java:52`, which emits insert and
   * delete records as rows enter/leave the Top-N set): per event_type
   * keep the N best rows by (value desc, event_id asc); every change
   * emits -D for evicted rows and +I for entrants, with a per-key
   * monotone out_seq. `ChangelogOps.normalize` over (event_type,
   * event_id) materializes the exact final Top-N membership. */
  def topNChangelog(ds: Dataset[Ev], n: Int, ttl: Option[String] = None): Dataset[TopNChange] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.event_type)
      .flatMapGroupsWithState[(List[TopNRow], Long), TopNChange](OutputMode.Append, Ttl.timeoutConf(ttl))(Ttl.wrap(ttl) {
        (k, it, state: GroupState[(List[TopNRow], Long)]) =>
          val (old, seq0) = state.getOption.getOrElse((Nil, 0L))
          val merged = (old.iterator ++ it.map(e => TopNRow(k, e.event_id, e.value)))
            .toList.distinct
            .sortBy(r => (-r.value, r.event_id))
            .take(n)
          var seq = seq0
          val out = List.newBuilder[TopNChange]
          old.filterNot(merged.contains).foreach { r =>
            seq += 1
            out += TopNChange(graft.changelog.RowKind.Delete, k, r.event_id, r.value, seq)
          }
          merged.filterNot(old.contains).foreach { r =>
            seq += 1
            out += TopNChange(graft.changelog.RowKind.Insert, k, r.event_id, r.value, seq)
          }
          state.update((merged, seq))
          out.result().iterator
      })
  }

  /** Count-trigger analog (reference
   * `windowing/triggers/CountTrigger.java`: FIRE every N elements):
   * per key, emit the running (count, cent-sum) aggregate at every
   * `every`-th row, in (ts, id) order. Composes the trigger surface
   * Spark lacks onto keyed state; the purging variant is `state
   * .remove()` at fire time (documented, not needed here). */
  def countTriggered(ds: Dataset[Ev], every: Int, ttl: Option[String] = None): Dataset[RunningRow] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Long), RunningRow](OutputMode.Append, Ttl.timeoutConf(ttl))(Ttl.wrap(ttl) {
        (k, it, state: GroupState[(Long, Long)]) =>
          var (n, cents) = state.getOption.getOrElse((0L, 0L))
          val out = List.newBuilder[RunningRow]
          it.toList.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
            n += 1
            cents += math.floor(e.value * 100).toLong
            if (n % every == 0) out += RunningRow(k, e.event_id, n, cents)
          }
          state.update((n, cents))
          out.result().iterator
      })
  }

  /** Per-key running aggregate in event order — the proc-time OVER
   * analog (append stream; each input row emitted exactly once with
   * its running count and integer-cent running sum). Rows inside a
   * micro-batch are sorted by (ts_us, event_id) before folding, so a
   * single batch reproduces the batch OVER result exactly; across
   * batches the fold continues from state (arrival order across
   * batches is the stream order, as in the reference's proc-time
   * variant). */
  /** One per-record changelog emission of the streaming group
   * aggregate: `seq` is the key's 1-based position in the emission LOG
   * (so the -U/+U cadence itself is oracle-checkable, not just the
   * final image). */
  case class AggChangeRow(user_id: Long, seq: Long, row_kind: String,
      n: Long, cents: Long)

  /** PER-RECORD changelog emission of a streaming group aggregate —
   * the reference's `GroupAggFunction.java:43` cadence with mini-batch
   * OFF: every input record that changes a key's accumulator emits the
   * retraction of the previous image and the new image (`-U` then
   * `+U`; the key's first record emits `+I`). This engine's default
   * changelog layer is per-micro-batch (MIGRATION divergence #1/#2 —
   * same final image, coalesced intermediate cadence); this operator
   * is the opt-in per-record mode for consumers that react to every
   * update (e.g. alerting).
   *
   * Records fold in strict (ts, id) order under watermark release
   * (the same peer-safety discipline as [[sortedEmitIndexed]]), so the
   * LOG is deterministic and equals the scalar fold over the sorted
   * input. Sentinel rows (event_id < 0) advance the watermark but
   * never enter state.
   *
   * Scale: one shuffle on the key; state per key = accumulator + only
   * the rows still above the watermark. */
  def groupAggChangelogPerRecord(ds: Dataset[Ev],
      watermarkDelay: String = "0 seconds",
      ttl: Option[String] = None): Dataset[AggChangeRow] = {
    import ds.sparkSession.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    Ttl.guard(ttl, watermarkDelay)
    val withWm = ds.toDF()
      .withColumn("__event_ts", timestamp_micros(col("ts_us")))
      .withWatermark("__event_ts", watermarkDelay)
      .as[Ev]
    // state: (pending (ts, id, cents) buffer, accumulator (n, cents)
    // — n == 0 means no image yet — and the per-key log position)
    withWm.groupByKey(_.user_id)
      .flatMapGroupsWithState[(List[(Long, Long, Long)], (Long, Long), Long), AggChangeRow](
          OutputMode.Append, Ttl.timeoutConf(ttl))(Ttl.wrap(ttl) {
        (k, it, state: GroupState[(List[(Long, Long, Long)], (Long, Long), Long)]) =>
          val (buf0, acc0, seq0) = state.getOption
            .getOrElse((List.empty[(Long, Long, Long)], (0L, 0L), 0L))
          val buf = buf0 ++ it.filter(_.event_id >= 0)
            .map(e => (e.ts_us, e.event_id, math.floor(e.value * 100).toLong))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (ready, pending) = buf.partition(_._1 < wmUs)
          var (n, cents) = acc0
          var seq = seq0
          val out = List.newBuilder[AggChangeRow]
          ready.sorted.foreach { case (_, _, c) =>
            if (n > 0) { // retract the previous image first
              seq += 1
              out += AggChangeRow(k, seq, graft.changelog.RowKind.UpdateBefore, n, cents)
              n += 1; cents += c; seq += 1
              out += AggChangeRow(k, seq, graft.changelog.RowKind.UpdateAfter, n, cents)
            } else {
              n = 1; cents = c; seq += 1
              out += AggChangeRow(k, seq, graft.changelog.RowKind.Insert, n, cents)
            }
          }
          state.update((pending, (n, cents), seq))
          out.result().iterator
      })
  }

  def runningByUser(ds: Dataset[Ev], ttl: Option[String] = None): Dataset[RunningRow] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Long), RunningRow](OutputMode.Append, Ttl.timeoutConf(ttl))(Ttl.wrap(ttl) {
        (k, it, state: GroupState[(Long, Long)]) =>
          var (n, cents) = state.getOption.getOrElse((0L, 0L))
          val out = it.toList.sortBy(e => (e.ts_us, e.event_id)).map { e =>
            n += 1
            cents += math.floor(e.value * 100).toLong
            RunningRow(k, e.event_id, n, cents)
          }
          state.update((n, cents))
          out.iterator
      })
  }
}
