package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

import scala.collection.concurrent.TrieMap

/**
 * Metrics & observability surface (reference `flink-metrics/` —
 * Counter/Meter/Gauge per operator, reported through MetricGroup
 * reporters; the task-level names `numRecordsIn`,
 * `numRecordsInPerSecond`, `currentInputWatermark`): Spark's
 * engine-native feed is `StreamingQueryProgress` (per micro-batch:
 * input rows, processing rates, per-stateful-operator state rows, the
 * event-time watermark) delivered through `StreamingQueryListener` —
 * a config-level attach, like the reference's reporter registration.
 *
 * [[Recorder]] aggregates those events into per-query counters under
 * the reference's metric names; a real deployment would forward the
 * same events to its metrics backend instead (the reporter analog).
 */
object Metrics {

  /** Cumulative per-query counters (reference counter semantics). */
  final case class QueryCounters(
      batches: Long,
      numRecordsIn: Long,
      stateRows: Long,
      lastRecordsPerSecond: Double,
      currentInputWatermark: Option[String])

  final class Recorder extends StreamingQueryListener {
    private val byId = TrieMap.empty[java.util.UUID, QueryCounters]
    private val names = TrieMap.empty[String, java.util.UUID]

    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
      if (e.name != null) names.put(e.name, e.id)

    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      val prev = byId.getOrElse(p.id, QueryCounters(0, 0, 0, 0.0, None))
      byId.put(p.id, QueryCounters(
        batches = prev.batches + 1,
        numRecordsIn = prev.numRecordsIn + p.numInputRows,
        stateRows = p.stateOperators.map(_.numRowsTotal).sum,
        lastRecordsPerSecond = p.inputRowsPerSecond,
        currentInputWatermark = Option(p.eventTime.get("watermark"))))
    }

    override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

    def snapshot(id: java.util.UUID): Option[QueryCounters] = byId.get(id)
    def byName(name: String): Option[QueryCounters] = names.get(name).flatMap(byId.get)
  }

  /** Attach a recorder to the session's streams (the reporter-register
   * analog); detach with `spark.streams.removeListener`. */
  def attach(spark: SparkSession): Recorder = {
    val r = new Recorder
    spark.streams.addListener(r)
    r
  }
}
