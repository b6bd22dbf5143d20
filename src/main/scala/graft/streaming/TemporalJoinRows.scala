package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/**
 * Row-generic streaming temporal (versioned) join — the schema-dynamic
 * sibling of [[TemporalJoin.runTyped]], used by the SQL-transparent
 * rewrite (`graft.rules.StreamTemporalJoinRule`): the rule hands over
 * the two analyzed join children as DataFrames, so the operator must
 * work on `Row` without compile-time types, exactly as the reference's
 * `TemporalRowTimeJoinOperator` works on `RowData`
 * (`flink-table-runtime/.../join/temporal/TemporalRowTimeJoinOperator.java`).
 *
 * Semantics are identical to `runTyped`: each probe row is enriched
 * with the newest dim version at-or-before its event time, probes are
 * HELD until the watermark passes their time (release driven by
 * event-time timers), versions older than the newest at-or-below the
 * watermark are evicted.
 *
 * Scale: one shuffle on the join key for each side (the union), state
 * per key bounded by the watermark horizon — same story as `runTyped`.
 */
object TemporalJoinRows {

  /** Keyed state: dim versions DESC-sorted by (time, seq); held probes. */
  case class TjRowState(dims: List[(Long, Long, Row)], probes: List[(Long, Long, Row)])

  /** `timeIdx` column may be epoch-micros Long or a timestamp type. */
  private def microsCol(df: DataFrame, idx: Int): Column = {
    val f = df.schema.fields(idx)
    f.dataType match {
      case LongType => col(df.columns(idx))
      case _: TimestampType | _: TimestampNTZType =>
        unix_micros(col(df.columns(idx)).cast("timestamp"))
      case dt => throw new IllegalArgumentException(
        s"temporal join time column '${f.name}' has unsupported type $dt")
    }
  }

  /**
   * @param probe    streaming probe side (no watermark applied yet)
   * @param dim      streaming versioned side (no watermark applied yet)
   * @param leftOuter true → unmatched probes emit with null dim columns
   * @return DataFrame with schema = probe fields ++ dim fields
   *         (dim fields forced nullable), in probe-release order
   */
  def run(probe: DataFrame, dim: DataFrame,
      probeKeyIdx: Int, probeTimeIdx: Int,
      dimKeyIdx: Int, dimTimeIdx: Int, dimSeqIdx: Int,
      leftOuter: Boolean, watermarkDelay: String = "1 hour"): DataFrame = {
    val np = probe.schema.length
    // positional rename kills any cross-side name collisions before the
    // union envelope is built
    val pdf = probe.toDF((0 until np).map(i => s"p$i"): _*)
    val ddf = dim.toDF((0 until dim.schema.length).map(i => s"d$i"): _*)
    val pStruct = struct(pdf.columns.map(col).toSeq: _*)
    val dStruct = struct(ddf.columns.map(col).toSeq: _*)
    val pType = StructType(pdf.schema.fields)
    val dType = StructType(ddf.schema.fields)

    val env = pdf.select(
        lit(false).as("__isdim"),
        col(pdf.columns(probeKeyIdx)).cast("string").as("__key"),
        microsCol(pdf, probeTimeIdx).as("__time_us"),
        lit(0L).as("__seq"),
        pStruct.as("__p"),
        lit(null).cast(dType).as("__d"))
      .unionByName(ddf.select(
        lit(true).as("__isdim"),
        col(ddf.columns(dimKeyIdx)).cast("string").as("__key"),
        microsCol(ddf, dimTimeIdx).as("__time_us"),
        col(ddf.columns(dimSeqIdx)).cast("long").as("__seq"),
        lit(null).cast(pType).as("__p"),
        dStruct.as("__d")))
      // ONE watermark node over the union (two would min-combine and
      // the slower side would stall probe release on bounded inputs)
      .withColumn("__event_ts", timestamp_micros(col("__time_us")))
      .withWatermark("__event_ts", watermarkDelay)

    val outSchema = StructType(
      pdf.schema.fields ++ ddf.schema.fields.map(_.copy(nullable = true)))
    val dimNulls = Seq.fill(ddf.schema.length)(null)
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    implicit val stEnc: Encoder[TjRowState] = Encoders.kryo[TjRowState]
    implicit val outEnc: Encoder[Row] = Encoders.row(outSchema)

    env.groupByKey((r: Row) => r.getString(1))
      .flatMapGroupsWithState[TjRowState, Row](
          OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_, it, state: GroupState[TjRowState]) =>
          val st = state.getOption.getOrElse(TjRowState(Nil, Nil))
          var versions = st.dims
          var pending = st.probes
          it.foreach { r =>
            val t = r.getLong(2)
            if (r.getBoolean(0)) {
              val v = (t, r.getLong(3), r.getStruct(5))
              val (newer, older) =
                versions.span(x => x._1 > v._1 || (x._1 == v._1 && x._2 > v._2))
              versions = newer ::: (v :: older)
            } else pending ::= ((t, r.getLong(3), r.getStruct(4)))
          }
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          // strict release: a probe AT the watermark could still gain a
          // same-instant version from a later batch
          val (ready, still) = pending.partition(_._1 < wmUs)
          val out = ready.sortBy(r => (r._1, r._2)).flatMap { case (t, _, p) =>
            versions.find(_._1 <= t) match {
              case Some((_, _, d)) => Some(Row.fromSeq(p.toSeq ++ d.toSeq))
              case None if leftOuter => Some(Row.fromSeq(p.toSeq ++ dimNulls))
              case None => None
            }
          }
          if (wmUs > 0L) {
            val (newer, older) = versions.span(_._1 > wmUs)
            versions = newer ::: older.take(1)
          }
          // drop the key entirely once nothing is held for it — a key
          // whose probes have all been released would otherwise pin one
          // dim version (or an empty record) in state forever
          if (versions.isEmpty && still.isEmpty) state.remove()
          else state.update(TjRowState(versions, still))
          if (still.nonEmpty) {
            val nextMs = (still.map(_._1).min + 999) / 1000
            state.setTimeoutTimestamp(math.max(nextMs, state.getCurrentWatermarkMs() + 1))
          }
          out.iterator
      }.toDF()
  }
}
