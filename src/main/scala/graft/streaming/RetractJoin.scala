package graft.streaming

import graft.changelog.RowKind
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Union-typed input: an upsert row for the left or right side of the
 * join, keyed by the join key. `seq` identifies the left version
 * (e.g. an order id); `time_us` orders rows within a batch. */
case class RjInput(isLeft: Boolean, key: Long, time_us: Long, seq: Long, payload: Double)

/** One emitted changelog row: the join image before (-U) or after
 * (+I/+U) a change, with a per-key monotone `out_seq` so the stream
 * normalizes deterministically. */
case class RjChange(row_kind: String, key: Long, left_seq: Option[Long],
    left_payload: Option[Double], right_payload: Option[Double], out_seq: Long)

/** Per-key state: current row of each side + emission counter. */
case class RjState(leftSeq: Option[Long], leftPayload: Option[Double],
    right: Option[Double], emitted: Long)

/**
 * Retraction-aware streaming two-input join — reference
 * `join/stream/StreamingJoinOperator.java` (inner join over two
 * update streams, emitting UPDATE_BEFORE/UPDATE_AFTER as either side
 * changes), on the upsert-input subset where the join key is each
 * side's primary key (the reference's `JoinInputSideSpec
 * .withUniqueKeyContainedByJoinKey` fast path — state keeps ONE row
 * per side per key, the O(1) state shape).
 *
 * Spark has no two-input stateful operator, so both sides are UNIONed
 * with a side tag into one `flatMapGroupsWithState` keyed by the join
 * key (SURVEY §2.9 two-input emulation). Within a batch rows apply in
 * (time_us, side, seq) order; each arrival that changes a complete
 * join image emits the -U of the old image and the +U of the new one
 * (+I for the first image). The output is a changelog in the repo's
 * RowKind column convention — `ChangelogOps.normalize` materializes
 * the final join table from it.
 */
object RetractJoin {

  def run(in: Dataset[RjInput], ttl: Option[String] = None): Dataset[RjChange] = {
    import in.sparkSession.implicits._
    in.groupByKey(_.key)
      .flatMapGroupsWithState[RjState, RjChange](
          OutputMode.Append, Ttl.timeoutConf(ttl))(Ttl.wrap(ttl) {
        (key, it, state: GroupState[RjState]) =>
          var st = state.getOption.getOrElse(RjState(None, None, None, 0L))
          val out = List.newBuilder[RjChange]
          def emit(kind: String): Unit = {
            st = st.copy(emitted = st.emitted + 1)
            out += RjChange(kind, key, st.leftSeq, st.leftPayload, st.right, st.emitted)
          }
          it.toList.sortBy(r => (r.time_us, !r.isLeft, r.seq)).foreach { r =>
            val hadImage = st.leftSeq.isDefined && st.right.isDefined
            if (hadImage) emit(RowKind.UpdateBefore)
            if (r.isLeft) st = st.copy(leftSeq = Some(r.seq), leftPayload = Some(r.payload))
            else st = st.copy(right = Some(r.payload))
            if (st.leftSeq.isDefined && st.right.isDefined)
              emit(if (hadImage) RowKind.UpdateAfter else RowKind.Insert)
          }
          state.update(st)
          out.result().iterator
      })
  }
}
