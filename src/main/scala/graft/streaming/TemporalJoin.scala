package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.{col, timestamp_micros}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Union-typed input element: a versioned dimension row or a probe. */
case class TjInput(isDim: Boolean, key: Long, time_us: Long, seq: Long,
    probe_id: Long, dim_payload: Double)

/** One enriched probe row (left-join semantics). */
case class TjOutput(probe_id: Long, key: Long, time_us: Long,
    matched_seq: Option[Long], matched_payload: Option[Double])

/** Per-key state: dim versions (time_us, seq, payload) sorted
 * DESCENDING by (time, seq), pruned on watermark advance. */
case class TjVersions(versions: List[(Long, Long, Double)])

/**
 * Streaming temporal (versioned) join — reference
 * `exec/stream/StreamExecTemporalJoin.java:67` / runtime
 * `join/temporal/TemporalRowTimeJoinOperator.java`: each probe row is
 * enriched with the dimension version in force at the probe's event
 * time (`FOR SYSTEM_TIME AS OF p.time`).
 *
 * Spark has no two-input stateful operator, so dim and probe streams
 * are UNIONed with a type tag into one `flatMapGroupsWithState` keyed
 * by the join key (SURVEY §2.9 two-input emulation — same pattern as
 * broadcast state). Per key the state holds the versioned dim rows;
 * within a batch, rows are processed in (time, dim-before-probe, seq)
 * order, so a single batch reproduces exact event-time as-of semantics
 * (verified against the DuckDB oracle); across batches, probes see all
 * versions with time <= their own that have ARRIVED — the reference's
 * proc-time behavior; its row-time variant holds probes until the
 * watermark passes, which Spark's flatMapGroupsWithState cannot
 * trigger emission on (documented divergence).
 *
 * Scale: state per key = the versions still inside the watermark
 * horizon. After each batch, every version older than the newest
 * version at-or-before the watermark is evicted — future probes
 * (≥ watermark) can only ever match that newest-below-watermark
 * version or a newer one. This is the reference's state retention in
 * `join/temporal/TemporalRowTimeJoinOperator.java` (cleanup below
 * `currentWatermark`). The list is kept DESC-sorted by (time, seq) so
 * each probe is a prefix scan, not a full filter+maxBy.
 */
object TemporalJoin {

  def run(in: Dataset[TjInput],
      watermarkDelay: String = "1 hour"): Dataset[TjOutput] = {
    import in.sparkSession.implicits._
    val withWm = in.toDF()
      .withColumn("__event_ts", timestamp_micros(col("time_us")))
      .withWatermark("__event_ts", watermarkDelay)
      .as[TjInput]
    withWm.groupByKey(_.key)
      .flatMapGroupsWithState[TjVersions, TjOutput](
          OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key, it, state: GroupState[TjVersions]) =>
          var versions = state.getOption.fold(List.empty[(Long, Long, Double)])(_.versions)
          val out = List.newBuilder[TjOutput]
          // dims sort before probes at the same instant (a version AS OF
          // time t is visible to a probe AT time t — inclusive)
          it.toList.sortBy(r => (r.time_us, !r.isDim, r.seq)).foreach { r =>
            if (r.isDim) {
              val v = (r.time_us, r.seq, r.dim_payload)
              val (newer, older) =
                versions.span(x => x._1 > v._1 || (x._1 == v._1 && x._2 > v._2))
              versions = newer ::: (v :: older)
            } else {
              // newest version at-or-before the probe time: first hit in
              // the DESC-sorted list
              val m = versions.find(_._1 <= r.time_us)
              out += TjOutput(r.probe_id, key, r.time_us, m.map(_._2), m.map(_._3))
            }
          }
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          if (wmUs > 0L) {
            val (newer, older) = versions.span(_._1 > wmUs)
            versions = newer ::: older.take(1)
          }
          state.update(TjVersions(versions))
          out.result().iterator
      }
  }
}
