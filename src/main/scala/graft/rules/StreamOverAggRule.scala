package graft.rules

import org.apache.spark.sql.{Encoder, Encoders, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.CalendarInterval

/**
 * SQL-transparent streaming OVER aggregation: rewrite
 *
 *   Window(agg(x) OVER (PARTITION BY k ORDER BY ts
 *            [ROWS|RANGE BETWEEN b PRECEDING AND CURRENT ROW]), child)
 *
 * on a STREAMING child into a keyed watermark-released state operator —
 * the reference's `StreamExecOverAggregate` backed by
 * `RowTimeRowsBoundedPrecedingFunction` / `RowTimeRangeBounded…` /
 * the unbounded `RowTimeRowsUnboundedPrecedingFunction`. Spark cannot
 * execute a window function on a stream at all, so without this
 * rewrite the query is simply unsupported. Completes the
 * SQL-transparency trio with `StreamRankToTopNRule` (ROW_NUMBER) and
 * `StreamTemporalJoinRule` (FOR SYSTEM_TIME AS OF).
 *
 * Supported shape (anything else is left untouched): one or more
 * partition attributes; ORDER BY one ascending time attribute (Timestamp[NTZ] or
 * epoch-micros Long — rows release in that order once the watermark
 * strictly passes them, so output is micro-batch-independent; ROWS
 * ties release in arrival order — give unique order keys for
 * deterministic output); SUM/COUNT/MIN/MAX/AVG over a direct numeric
 * attribute (or COUNT(*)), STDDEV/VARIANCE (pop and samp), plus
 * FIRST_VALUE/LAST_VALUE navigation over any scalar attribute; each
 * expression carries its OWN frame (the reference
 * `StreamExecOverAggregate` groups window aggregates by frame) —
 * ROWS n PRECEDING, RANGE interval PRECEDING, or UNBOUNDED
 * PRECEDING, each ending at CURRENT ROW. ROWS UNBOUNDED PRECEDING
 * emits per released row (ties see their running prefix), RANGE
 * UNBOUNDED PRECEDING accumulates a full ts-peer group before
 * emitting — the batch Window semantics for each frame type.
 *
 * Late data: the operator runs under event-time timeout, so Spark
 * drops input rows at or below the current watermark before they
 * reach the state function — the same late-record drop as the
 * reference's row-time OVER functions. Rows are held until the
 * watermark strictly passes their timestamp, so an ADMITTED row can
 * never be a ts-peer of an already-released one: released frames are
 * final.
 *
 * Scale: state per key is the frame horizon — last n rows (ROWS),
 * the range interval (RANGE), or O(#aggs) running accumulators
 * (UNBOUNDED — no row history at all); input shuffles once on the
 * partition key. Registered via `GraftExtensions` as a post-hoc
 * resolution rule (must run before the streaming
 * UnsupportedOperationChecker sees the Window node).
 */
case class StreamOverAggRule(session: SparkSession) extends Rule[LogicalPlan] {


  private sealed trait Mode
  private case class RowsMode(n: Int) extends Mode
  private case class RangeMode(us: Long) extends Mode
  /** ROWS UNBOUNDED PRECEDING: per-row running prefix (a ts-tie sees
   * only rows released before it). */
  private case object UnboundedRows extends Mode
  /** RANGE UNBOUNDED PRECEDING: ts-peer groups share the frame. */
  private case object UnboundedRange extends Mode
  /** LAG: frameless row offset over the released-row ring. */
  private case object LagMode extends Mode

  // fn ∈ sum/count/min/max/avg/stddev·/var·/first/last/lag; idx =
  // input ordinal (-1 for COUNT(*)); off = row offset (lag only);
  // mode = this expression's own frame
  private case class AggSpec(fn: String, idx: Int, in: DataType, out: DataType,
      off: Int = 0, mode: Mode = LagMode)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case w: Window if w.child.isStreaming => rewrite(w).getOrElse(w)
  }

  private def boundUs(e: Expression): Option[Long] = e match {
    case lit if lit.foldable => lit.eval() match {
      case i: Int => Some(-i.toLong)
      case l: Long => Some(-l)
      case ci: CalendarInterval if ci.months == 0 =>
        Some(-(ci.days * 86400000000L + ci.microseconds))
      case _ => None
    }
    case _ => None
  }

  private def rewrite(w: Window): Option[LogicalPlan] = {
    val child = w.child
    // one or more partition attributes (composite keys group by the
    // NUL-joined string form — NUL never appears in the driver data)
    val partIdx: Seq[Int] = w.partitionSpec.map {
      case a: Attribute =>
        val i = child.output.indexWhere(_.exprId == a.exprId)
        if (i < 0) return None
        i
      case _ => return None
    }
    if (partIdx.isEmpty) return None
    val (ti, tsMicros) = w.orderSpec match {
      case Seq(SortOrder(a: Attribute, Ascending, _, _)) =>
        val i = child.output.indexWhere(_.exprId == a.exprId)
        if (i < 0) return None
        a.dataType match {
          case TimestampType | TimestampNTZType => (i, false)
          case LongType => (i, true)
          case _ => return None
        }
      case _ => return None
    }

    val numericIn = Set[DataType](IntegerType, LongType, DoubleType)
    val aggs: Seq[(Alias, AggSpec)] = w.windowExpressions.map {
      // LAG(x, n): frameless row offset (reference LagAggFunction —
      // streaming OVER supports LAG); computed from the last-n
      // released rows, independent of the shared aggregate frame.
      case al @ Alias(we @ WindowExpression(
          Lag(input, offExpr, default, false), _), _) =>
        val off = offExpr match {
          case l if l.foldable => l.eval() match {
            case i: Int if i > 0 => i
            case _ => return None
          }
          case _ => return None
        }
        if (!default.foldable || default.eval() != null) return None
        def ordNav(e: Expression): Int = e match {
          case a: Attribute if (numericIn + StringType)(a.dataType) =>
            val i = child.output.indexWhere(_.exprId == a.exprId)
            if (i < 0) -2 else i
          case _ => -2
        }
        val idx = ordNav(input)
        if (idx < 0) return None
        if (!Set[DataType](LongType, DoubleType, IntegerType, StringType)(we.dataType))
          return None
        (al, AggSpec("lag", idx, input.dataType, we.dataType, off, LagMode))
      case al @ Alias(WindowExpression(ae: AggregateExpression,
          WindowSpecDefinition(_, _, frame)), _) if !ae.isDistinct =>
        val m = frame match {
          case SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow) => UnboundedRows
          case SpecifiedWindowFrame(RangeFrame, UnboundedPreceding, CurrentRow) => UnboundedRange
          case SpecifiedWindowFrame(RowFrame, lo, CurrentRow) =>
            boundUs(lo) match {
              case Some(n) if n >= 0 && n <= Int.MaxValue => RowsMode(n.toInt)
              case _ => return None
            }
          case SpecifiedWindowFrame(RangeFrame, lo, CurrentRow) =>
            boundUs(lo) match { case Some(us) if us >= 0 => RangeMode(us); case _ => return None }
          case _ => return None
        }
        def ordT(e: Expression, ok: Set[DataType]): Int = e match {
          case a: Attribute if ok(a.dataType) =>
            val i = child.output.indexWhere(_.exprId == a.exprId)
            if (i < 0) -2 else i // -2 = unsupported (never a valid ordinal)
          case _ => -2
        }
        def ord(e: Expression): Int = ordT(e, numericIn)
        val navIn = numericIn + StringType // FIRST/LAST navigate any scalar
        val spec = ae.aggregateFunction match {
          case Count(Seq(Literal(1, _))) => AggSpec("count", -1, LongType, LongType, 0, m)
          case Count(Seq(e)) => AggSpec("count", ord(e), LongType, LongType, 0, m)
          case Sum(e, _) => AggSpec("sum", ord(e), e.dataType, ae.dataType, 0, m)
          case Min(e) => AggSpec("min", ord(e), e.dataType, ae.dataType, 0, m)
          case Max(e) => AggSpec("max", ord(e), e.dataType, ae.dataType, 0, m)
          case Average(e, _) => AggSpec("avg", ord(e), e.dataType, ae.dataType, 0, m)
          case StddevSamp(e, _) => AggSpec("stdsamp", ord(e), e.dataType, DoubleType, 0, m)
          case StddevPop(e, _) => AggSpec("stdpop", ord(e), e.dataType, DoubleType, 0, m)
          case VarianceSamp(e, _) => AggSpec("varsamp", ord(e), e.dataType, DoubleType, 0, m)
          case VariancePop(e, _) => AggSpec("varpop", ord(e), e.dataType, DoubleType, 0, m)
          case First(e, false) => AggSpec("first", ordT(e, navIn), e.dataType, ae.dataType, 0, m)
          case Last(e, false) => AggSpec("last", ordT(e, navIn), e.dataType, ae.dataType, 0, m)
          case _ => return None
        }
        // COUNT(*) legitimately carries idx -1; any other aggregate
        // must reference a direct scalar child attribute
        if (spec.idx < 0 && !(spec.fn == "count" && spec.idx == -1)) return None
        // the spliced projection must reproduce the analyzed output
        // type exactly; the evaluator below covers these combinations
        val outOk = spec.fn match {
          case "first" | "last" => Set[DataType](LongType, DoubleType, IntegerType, StringType)(spec.out)
          case "stdsamp" | "stdpop" | "varsamp" | "varpop" => ae.dataType == DoubleType
          case _ => Set[DataType](LongType, DoubleType, IntegerType)(spec.out)
        }
        if (!outOk) return None
        (al, spec)
      case _ => return None
    }
    if (aggs.isEmpty) return None
    val maxLag = aggs.map(_._2.off).max

    val df = org.apache.spark.sql.graft.SqlShim.ofRows(session, child)
    val outSchema = StructType(child.schema.fields ++
      aggs.map { case (al, s) => StructField(al.name, s.out, nullable = true) })
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    implicit val stEnc: Encoder[OverRuleState] = Encoders.kryo[OverRuleState]
    implicit val outEnc: Encoder[Row] = Encoders.row(outSchema)

    val tsOf: Row => Long =
      if (tsMicros) r => r.get(ti).asInstanceOf[Number].longValue
      else r => {
        r.get(ti) match {
          case t: java.sql.Timestamp => t.getTime * 1000L + (t.getNanos / 1000) % 1000
          case ldt: java.time.LocalDateTime =>
            ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000
          case inst: java.time.Instant => inst.getEpochSecond * 1000000L + inst.getNano / 1000
          case n: Number => n.longValue
        }
      }
    def numOf(r: Row, i: Int): Option[Double] =
      if (r.isNullAt(i)) None else Some(r.get(i).asInstanceOf[Number].doubleValue)
    def longOf(r: Row, i: Int): Option[Long] =
      if (r.isNullAt(i)) None else Some(r.get(i).asInstanceOf[Number].longValue)

    /** Fold one aggregate over the frame rows, shaped to `out`. */
    def evalAgg(s: AggSpec, frame: scala.collection.Seq[Row]): Any = s.fn match {
      case "first" => if (frame.isEmpty || frame.head.isNullAt(s.idx)) null else frame.head.get(s.idx)
      case "last" => if (frame.isEmpty || frame.last.isNullAt(s.idx)) null else frame.last.get(s.idx)
      case "count" =>
        if (s.idx < 0) frame.size.toLong else frame.count(r => !r.isNullAt(s.idx))
      case "avg" =>
        val vs = frame.flatMap(r => numOf(r, s.idx))
        if (vs.isEmpty) null else vs.sum / vs.size
      case "stdsamp" | "stdpop" | "varsamp" | "varpop" =>
        val vs = frame.flatMap(r => numOf(r, s.idx))
        varShape(s.fn, vs.size, vs.sum, { val n = vs.size
          if (n == 0) 0.0 else { val m = vs.sum / n
            vs.map(v => (v - m) * (v - m)).sum } })
      case fn =>
        val integral = s.in == IntegerType || s.in == LongType
        if (integral) {
          val vs = frame.flatMap(r => longOf(r, s.idx))
          if (vs.isEmpty) null
          else {
            val v = fn match { case "sum" => vs.sum; case "min" => vs.min; case "max" => vs.max }
            if (s.out == IntegerType) v.toInt else v
          }
        } else {
          val vs = frame.flatMap(r => numOf(r, s.idx))
          if (vs.isEmpty) null
          else fn match { case "sum" => vs.sum; case "min" => vs.min; case "max" => vs.max }
        }
    }
    // LAG(x, n) reads the n-back released row from the bounded ring
    def lagVal(s: AggSpec, recent: List[Row]): Any = {
      val nRec = recent.length
      if (nRec < s.off) null
      else { val rr = recent(nRec - s.off); if (rr.isNullAt(s.idx)) null else rr.get(s.idx) }
    }

    val aggSpecs = aggs.map(_._2)
    // retained released-row history must serve the LARGEST bounded
    // frame of any expression (mixed frames: reference
    // StreamExecOverAggregate groups aggregates by frame; here each
    // spec reads its own slice of one shared history)
    val maxRowsN = aggSpecs.collect { case AggSpec(_, _, _, _, _, RowsMode(n)) => n }
      .maxOption.getOrElse(0)
    val maxRangeUs = aggSpecs.collect { case AggSpec(_, _, _, _, _, RangeMode(us)) => us }
      .maxOption.getOrElse(-1L)
    // composite keys: length-prefixed parts (a NUL-joined form would
    // collide when a part itself contains the separator, and a null
    // part with the literal string "null")
    val keyOf: Row => String = r => partIdx.map { i =>
      val v = String.valueOf(r.get(i))
      (if (r.isNullAt(i)) "n" else "v") + v.length + ":" + v
    }.mkString
    val updates = df.groupByKey(keyOf)
      .flatMapGroupsWithState[OverRuleState, Row](
          OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_, it, state) =>
          val st = state.getOption.getOrElse(OverRuleState(Nil, Nil, Nil, Nil))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          // stable sort: ROWS ties keep arrival order (documented)
          val all = (st.pending ++ it.toList).sortBy(tsOf)
          // strict release — same peer-group-safety argument as the
          // BoundedOver operator: a row at ts == watermark could still
          // gain same-ts peers in a later batch
          val (ready, pending) = all.partition(r => tsOf(r) < wmUs)
          var accs = st.accs
          var recent = st.recent // last maxLag released rows (lag ring)
          if (accs.isEmpty) accs =
            aggSpecs.map(_ => OverAcc(0L, 0.0, 0L, None, None, None, None)).toList
          val out = List.newBuilder[Row]
          def pushRecent(r: Row): Unit =
            if (maxLag > 0) recent = (recent :+ r).takeRight(maxLag)
          // all retained released rows, in release order
          val released = scala.collection.mutable.ArrayBuffer[Row](st.history: _*)
          ready.groupBy(tsOf).toList.sortBy(_._1).foreach { case (t, rows) =>
            // RANGE UNBOUNDED: the whole ts-peer group accumulates
            // before any peer emits (peers share the frame)
            accs = accs.zip(aggSpecs).map { case (a, s) =>
              if (s.mode == UnboundedRange) rows.foldLeft(a)(accAdd(s)) else a }
            // RANGE bounded frames see every peer of the current ts
            val withPeers = released ++ rows
            rows.foreach { r =>
              // ROWS UNBOUNDED: strictly running — this row joins the
              // accumulator before emission, ties see their prefix
              accs = accs.zip(aggSpecs).map { case (a, s) =>
                if (s.mode == UnboundedRows) accAdd(s)(a, r) else a }
              val outVals = aggSpecs.zip(accs).map { case (s, a) => s.mode match {
                case LagMode => lagVal(s, recent)
                case UnboundedRows | UnboundedRange => accOut(s, a)
                case RowsMode(n) => evalAgg(s, released.takeRight(n) :+ r)
                case RangeMode(us) => evalAgg(s, withPeers.filter(x => tsOf(x) >= t - us))
              }}
              out += Row.fromSeq(r.toSeq ++ outVals)
              pushRecent(r)
              released += r
            }
          }
          // trim: keep the last maxRowsN rows plus everything a future
          // RANGE frame can still reference (next release is >= wmUs)
          val keepFrom = released.length - maxRowsN
          val hist = released.zipWithIndex.collect {
            case (r, i) if i >= keepFrom || (maxRangeUs >= 0L && tsOf(r) >= wmUs - maxRangeUs) => r
          }.toList
          state.update(OverRuleState(pending, hist, accs, recent))
          if (pending.nonEmpty) {
            val nextMs = (pending.map(tsOf).min + 999) / 1000
            state.setTimeoutTimestamp(math.max(nextMs, state.getCurrentWatermarkMs() + 1))
          }
          out.result().iterator
      }

    // splice back with the ORIGINAL output attribute ids; pass-through
    // columns bind POSITIONALLY via their ordinal in child.output
    // (outSchema preserves child field order) — name lookup would bind
    // the wrong attribute when the child output carries duplicate
    // names, legal after self-joins
    val newOut = updates.queryExecution.analyzed.output
    val aliases: Seq[NamedExpression] = w.output.map { orig =>
      val src = aggs.indexWhere(_._1.exprId == orig.exprId) match {
        case -1 =>
          val ord = child.output.indexWhere(_.exprId == orig.exprId)
          if (ord < 0) return None
          newOut(ord)
        case i => newOut(child.output.length + i)
      }
      Alias(src, orig.name)(exprId = orig.exprId)
    }
    Some(Project(aliases, updates.queryExecution.analyzed))
  }

  /** Shape (n, Σx, m2) into the requested variance family member.
   * m2 = Σ(x−mean)² — callers supply it two-pass (bounded frames) or
   * via the sum-of-squares accumulator (unbounded frames). SQL: pop
   * variants are NULL on n=0, samp variants on n<2. */
  private def varShape(fn: String, n: Long, sum: Double, m2: Double): Any = {
    if (n == 0) null
    else fn match {
      case "varpop" => m2 / n
      case "stdpop" => math.sqrt(m2 / n)
      case "varsamp" => if (n < 2) null else m2 / (n - 1)
      case "stdsamp" => if (n < 2) null else math.sqrt(m2 / (n - 1))
    }
  }

  /** Accumulate one row into one aggregate's running state. */
  private def accAdd(s: AggSpec)(a: OverAcc, r: Row): OverAcc = {
    def valOrNull: Any = if (r.isNullAt(s.idx)) null else r.get(s.idx)
    s.fn match {
      case "first" => if (a.firstSet) a else a.copy(firstSet = true, firstV = valOrNull)
      case "last" => a.copy(lastV = valOrNull)
      case "lag" => a // computed from the released-row ring, not accumulators
      case _ if s.idx >= 0 && r.isNullAt(s.idx) => a // aggregates skip NULLs
      case "count" => a.copy(cnt = a.cnt + 1)
      case _ =>
        val num = r.get(s.idx).asInstanceOf[Number]
        // Welford update keeps m2 numerically stable over unbounded
        // prefixes (the naive Σx² − (Σx)²/n cancels catastrophically)
        val d = num.doubleValue - (if (a.cnt == 0) 0.0 else a.sumD / a.cnt)
        val newCnt = a.cnt + 1
        val newSumD = a.sumD + num.doubleValue
        val d2 = num.doubleValue - newSumD / newCnt
        OverAcc(newCnt, newSumD, a.sumL + num.longValue,
          Some(a.minD.fold(num.doubleValue)(math.min(_, num.doubleValue))),
          Some(a.maxD.fold(num.doubleValue)(math.max(_, num.doubleValue))),
          Some(a.minL.fold(num.longValue)(math.min(_, num.longValue))),
          Some(a.maxL.fold(num.longValue)(math.max(_, num.longValue))),
          m2 = a.m2 + d * d2)
    }
  }

  private def accOut(s: AggSpec, a: OverAcc): Any = s.fn match {
    case "first" => a.firstV
    case "last" => a.lastV
    case "count" => a.cnt
    case "avg" => if (a.cnt == 0) null else a.sumD / a.cnt
    case "sum" =>
      if (a.cnt == 0) null
      else if (s.in == DoubleType) a.sumD
      else if (s.out == IntegerType) a.sumL.toInt else a.sumL
    case "min" =>
      if (s.in == DoubleType) a.minD.orNull
      else a.minL.map(v => if (s.out == IntegerType) v.toInt else v).orNull
    case "max" =>
      if (s.in == DoubleType) a.maxD.orNull
      else a.maxL.map(v => if (s.out == IntegerType) v.toInt else v).orNull
    case "stdsamp" | "stdpop" | "varsamp" | "varpop" =>
      varShape(s.fn, a.cnt, a.sumD, a.m2)
  }
}

/** Keyed state of [[StreamOverAggRule]]'s operator: unreleased rows,
 * the released-row history a future frame can reference (empty in
 * unbounded mode), and the running accumulators (unbounded mode). */
case class OverRuleState(pending: List[Row], history: List[Row], accs: List[OverAcc],
    recent: List[Row] = Nil)

/** One aggregate's running accumulator (unbounded frames). */
case class OverAcc(cnt: Long, sumD: Double, sumL: Long,
    minD: Option[Double], maxD: Option[Double],
    minL: Option[Long] = None, maxL: Option[Long] = None,
    firstSet: Boolean = false, firstV: Any = null, lastV: Any = null,
    m2: Double = 0.0)
