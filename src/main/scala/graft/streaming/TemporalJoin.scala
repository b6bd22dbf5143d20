package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions.{col, timestamp_micros}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import scala.reflect.runtime.universe.TypeTag

/** Union envelope carrying either a dim version or a probe row (Spark
 * state operators are single-input, so the two streams union with a
 * type tag — SURVEY §2.9 two-input emulation). `seq` is the version
 * sequence for dims and the probe's unique id for probes (deterministic
 * emission order). */
case class TjEnv[D, P](isDim: Boolean, key: String, time_us: Long, seq: Long,
    dim: Option[D], probe: Option[P])

/** One enriched probe row (left-join semantics): the probe and the dim
 * version in force at the probe's event time (None when no version is
 * at-or-before it). */
case class TemporalJoined[P, D](probe: P, dim: Option[D])

/** Per-key state: dim versions (time, seq, payload) sorted DESCENDING
 * by (time, seq) and pruned on watermark advance, plus the probes still
 * HELD because the watermark has not passed their event time. */
case class TjStateG[D, P](dims: List[(Long, Long, D)], probes: List[(Long, Long, P)])

/**
 * Streaming temporal (versioned) join — reference
 * `exec/stream/StreamExecTemporalJoin.java:67` / runtime
 * `join/temporal/TemporalRowTimeJoinOperator.java`: each probe row is
 * enriched with the dimension version in force at the probe's event
 * time (`FOR SYSTEM_TIME AS OF p.time`).
 *
 * ROW-TIME semantics, as the reference: a probe is HELD in keyed state
 * until the watermark passes its event time — only then is the set of
 * dim versions at-or-before that time complete — and released in
 * (time, id) order. Release is driven by
 * `GroupStateTimeout.EventTimeTimeout` (each key arms a timer at its
 * earliest pending probe), the analog of the reference's registered
 * event-time timer (`TemporalRowTimeJoinOperator.registerSmallestTimer`).
 * A version AT the probe's instant is visible (as-of inclusive).
 *
 * Generic over both schemas (the reference operator is RowData-generic;
 * here `D`/`P` are any case classes, with key/time/seq/id picked out by
 * field name, the same recipe as `Cep.runBoundBy`).
 *
 * Scale: state per key = versions in the watermark horizon (every
 * version older than the newest at-or-below the watermark is evicted —
 * future probes can only match that one or newer, the reference's
 * cleanup below `currentWatermark`) + probes within the watermark
 * delay. The DESC-sorted version list makes each probe a prefix scan.
 */
object TemporalJoin {

  def runTyped[D <: Product : TypeTag, P <: Product : TypeTag](
      dims: Dataset[D], probes: Dataset[P],
      dimKey: String, dimTime: String, dimSeq: String,
      probeKey: String, probeTime: String, probeId: String,
      watermarkDelay: String = "1 hour"): Dataset[TemporalJoined[P, D]] = {
    implicit val dEnc: Encoder[D] = Encoders.product[D]
    implicit val pEnc: Encoder[P] = Encoders.product[P]
    implicit val envEnc: Encoder[TjEnv[D, P]] = Encoders.product[TjEnv[D, P]]
    implicit val stEnc: Encoder[TjStateG[D, P]] = Encoders.product[TjStateG[D, P]]
    implicit val outEnc: Encoder[TemporalJoined[P, D]] = Encoders.product[TemporalJoined[P, D]]
    implicit val keyEnc: Encoder[String] = Encoders.STRING

    def getters[T <: Product](schema: org.apache.spark.sql.types.StructType,
        kf: String, tf: String, sf: String): (T => String, T => Long, T => Long) = {
      val (ki, ti, si) = (schema.fieldIndex(kf), schema.fieldIndex(tf), schema.fieldIndex(sf))
      (t => String.valueOf(t.productElement(ki)),
        t => t.productElement(ti).asInstanceOf[Number].longValue,
        t => t.productElement(si).asInstanceOf[Number].longValue)
    }
    val (keyD, timeD, seqD) = getters[D](dEnc.schema, dimKey, dimTime, dimSeq)
    val (keyP, timeP, idP) = getters[P](pEnc.schema, probeKey, probeTime, probeId)

    // ONE watermark node over the union: sentinel/flush rows on either
    // input advance the join's single event-time clock (two separate
    // watermarks would min-combine and the slower side would stall
    // probe release forever on bounded inputs)
    val env = dims.map(d => TjEnv[D, P](isDim = true, keyD(d), timeD(d), seqD(d), Some(d), None))
      .union(probes.map(p => TjEnv[D, P](isDim = false, keyP(p), timeP(p), idP(p), None, Some(p))))
    val withWm = env.toDF()
      .withColumn("__event_ts", timestamp_micros(col("time_us")))
      .withWatermark("__event_ts", watermarkDelay)
      .as[TjEnv[D, P]]

    withWm.groupByKey(_.key)
      .flatMapGroupsWithState[TjStateG[D, P], TemporalJoined[P, D]](
          OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_, it, state: GroupState[TjStateG[D, P]]) =>
          val st = state.getOption.getOrElse(TjStateG[D, P](Nil, Nil))
          var versions = st.dims
          var pending = st.probes
          it.foreach { r =>
            if (r.isDim) {
              val v = (r.time_us, r.seq, r.dim.get)
              val (newer, older) =
                versions.span(x => x._1 > v._1 || (x._1 == v._1 && x._2 > v._2))
              versions = newer ::: (v :: older)
            } else pending ::= ((r.time_us, r.seq, r.probe.get))
          }
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          // Strict release: `getCurrentWatermarkMs` is the EVICTION
          // watermark (advanced by this batch), while Spark's late-row
          // filter admits arrivals above the PREVIOUS batch's watermark
          // — so a dim version with time in (wm_prev, wm_evict] can
          // still arrive in a later batch. A probe AT the eviction
          // watermark must therefore hold; rows at-or-below wm_prev are
          // dropped by the exec-level late filter before reaching here
          // (the stateful-operator late-data contract).
          val (ready, still) = pending.partition(_._1 < wmUs)
          val out = ready.sortBy(r => (r._1, r._2)).map { case (t, _, p) =>
            // newest version at-or-before the probe time: first hit in
            // the DESC-sorted list
            TemporalJoined(p, versions.find(_._1 <= t).map(_._3))
          }
          if (wmUs > 0L) {
            val (newer, older) = versions.span(_._1 > wmUs)
            versions = newer ::: older.take(1)
          }
          // drop the key entirely once nothing is held for it — a key
          // whose probes have all been released would otherwise pin an
          // empty record in the state store forever
          if (versions.isEmpty && still.isEmpty) state.remove()
          else state.update(TjStateG(versions, still))
          if (still.nonEmpty) {
            // ceil to ms (timer API is ms); must land above the current
            // watermark or Spark rejects the registration
            val nextMs = (still.map(_._1).min + 999) / 1000
            state.setTimeoutTimestamp(math.max(nextMs, state.getCurrentWatermarkMs() + 1))
          }
          out.iterator
      }
  }
}
