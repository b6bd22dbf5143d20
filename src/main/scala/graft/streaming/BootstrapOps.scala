package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Per-key running totals: the bootstrapped state AND the output row. */
case class BootTotal(user_id: Long, n: Long, cents: Long)

/**
 * State bootstrap — the State Processor API analog (reference
 * `flink-libraries/flink-state-processing-api/.../OperatorTransformation.java:66`
 * `bootstrapWith(dataSet)` + `KeyedOperatorTransformation` /
 * `WritableSavepoint`): a BATCH frame seeds each key's state before the
 * first micro-batch, and the stream folds on top of the seeded values —
 * the reference's "write a savepoint from a DataSet, then start the
 * streaming job from it" workflow collapsed into Spark's
 * `transformWithState` initial-state overload (arbitrary state v2).
 *
 * The read direction of that API (inspecting an existing savepoint) is
 * the state data source — `spark.read.format("statestore")`, covered by
 * StateBackendSpec's queryable-state test.
 *
 * Scale: the initial-state frame is shuffled once on the grouping key
 * into the state store partitions, exactly like a first micro-batch of
 * that size; per-key state stays O(1) (one BootTotal row).
 */
object BootstrapOps {

  /** Running (count, cents) per key, seeded from the bootstrap frame.
   * Emits the post-fold total for every key touched by a batch; seeded
   * keys with no traffic keep their state but emit nothing (the
   * reference's bootstrap writes state without emitting records). */
  class BootstrappedTotalsProcessor
      extends StatefulProcessorWithInitialState[Long, Ev, BootTotal, BootTotal] {
    @transient private var totals: ValueState[BootTotal] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[BootTotal](
        "totals", Encoders.product[BootTotal], TTLConfig.NONE)

    override def handleInitialState(key: Long, initial: BootTotal,
        timerValues: TimerValues): Unit =
      totals.update(initial)

    override def handleInputRows(key: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[BootTotal] = {
      val prev = if (totals.exists()) totals.get() else BootTotal(key, 0L, 0L)
      var n = prev.n
      var cents = prev.cents
      rows.foreach { e => n += 1; cents += math.floor(e.value * 100).toLong }
      val now = BootTotal(key, n, cents)
      totals.update(now)
      Iterator.single(now)
    }
  }

  /** Fold the event stream into per-user totals seeded by `initial`. */
  def totalsWithBootstrap(stream: Dataset[Ev],
      initial: Dataset[BootTotal]): Dataset[BootTotal] = {
    import stream.sparkSession.implicits._
    stream.groupByKey(_.user_id)
      .transformWithState(new BootstrappedTotalsProcessor,
        TimeMode.None(), OutputMode.Update(), initial.groupByKey(_.user_id))
  }
}
