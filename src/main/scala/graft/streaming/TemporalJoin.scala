package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Union-typed input element: a versioned dimension row or a probe. */
case class TjInput(isDim: Boolean, key: Long, time_us: Long, seq: Long,
    probe_id: Long, dim_payload: Double)

/** One enriched probe row (left-join semantics). */
case class TjOutput(probe_id: Long, key: Long, time_us: Long,
    matched_seq: Option[Long], matched_payload: Option[Double])

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
 * Scale: state per key = that key's version history (prunable to the
 * latest version older than the watermark horizon, exactly like the
 * reference's state retention).
 */
object TemporalJoin {

  def run(in: Dataset[TjInput]): Dataset[TjOutput] = {
    import in.sparkSession.implicits._
    in.groupByKey(_.key)
      .flatMapGroupsWithState[List[(Long, Long, Double)], TjOutput](
          OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key, it, state: GroupState[List[(Long, Long, Double)]]) =>
          var versions = state.getOption.getOrElse(Nil) // (time_us, seq, payload)
          val out = List.newBuilder[TjOutput]
          // dims sort before probes at the same instant (a version AS OF
          // time t is visible to a probe AT time t — inclusive)
          it.toList.sortBy(r => (r.time_us, !r.isDim, r.seq)).foreach { r =>
            if (r.isDim) versions ::= ((r.time_us, r.seq, r.dim_payload))
            else {
              val m = versions.filter(_._1 <= r.time_us) match {
                case Nil => None
                case vs => Some(vs.maxBy(v => (v._1, v._2)))
              }
              out += TjOutput(r.probe_id, key, r.time_us, m.map(_._2), m.map(_._3))
            }
          }
          state.update(versions)
          out.result().iterator
      }
  }
}
