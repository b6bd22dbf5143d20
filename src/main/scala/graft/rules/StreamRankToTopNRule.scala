package graft.rules

import org.apache.spark.sql.{Encoder, Encoders, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/**
 * SQL-transparent streaming Top-N: rewrite
 *
 *   Filter(rn <= N, ... Window(ROW_NUMBER() OVER (PARTITION BY k
 *                                ORDER BY v [DESC], ...) AS rn, child))
 *
 * on a STREAMING child into the keyed Top-N state operator — the
 * reference's `FlinkLogicalRankRule.scala:39` +
 * `StreamExecRank.java:73`, which is how `ROW_NUMBER() <= N` becomes an
 * incrementally-maintained rank in SQL. Spark cannot execute a
 * non-time window on a stream at all, so without this rewrite the
 * query is simply unsupported.
 *
 * The replacement is an UPDATE stream: whenever a key's Top-N set
 * changes, the whole set re-emits with current ranks (an upsert sink
 * keyed on (partition, rn) — or a dedup + re-rank — materializes the
 * final image, as the reference's UpdateRank emits upserts).
 *
 * Shape requirements (anything else is left untouched): a single
 * ROW_NUMBER window expression; one or more partition attributes;
 * numeric, timestamp, date, or string order attributes (the caller
 * should include a unique tiebreaker for deterministic output, as SQL
 * ROW_NUMBER ties are arbitrary); a `rn <= N` / `rn < N` / `rn = 1`
 * filter over exactly that rank. `rn = 1` is the reference's
 * DEDUPLICATE shape (`StreamExecDeduplicate.java:70` — keep-first when
 * the time attribute orders ascending, keep-last descending), which
 * shares this operator as Top-1.
 *
 * Registered via `GraftExtensions` as a post-hoc resolution rule — it
 * must run during ANALYSIS, before the streaming
 * UnsupportedOperationChecker sees the Window node.
 *
 * Scale: state per key is the N-row buffer (the reference's
 * AppendOnlyTopNFunction state), input shuffles once on the partition
 * key.
 */
case class StreamRankToTopNRule(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, sub) =>
      unwrap(sub) match {
        case Some(w) if w.child.isStreaming => rewrite(f, cond, w).getOrElse(f)
        case _ => f
      }
  }

  /** Strip SubqueryAlias / attribute-only Project layers above the
   * Window (the analyzed shape of `... FROM (subquery) WHERE`). */
  private def unwrap(p: LogicalPlan): Option[Window] = p match {
    case w: Window => Some(w)
    case SubqueryAlias(_, child) => unwrap(child)
    case Project(projList, child) if projList.forall(_.isInstanceOf[Attribute]) =>
      unwrap(child)
    case _ => None
  }

  private def rewrite(f: Filter, cond: Expression, w: Window): Option[LogicalPlan] = {
    val rnAlias = w.windowExpressions match {
      case Seq(a @ Alias(WindowExpression(_: RowNumber, _), _)) => a
      case _ => return None
    }
    val n: Int = cond match {
      case LessThanOrEqual(a: Attribute, Literal(v: Int, IntegerType))
          if a.exprId == rnAlias.exprId => v
      case LessThan(a: Attribute, Literal(v: Int, IntegerType))
          if a.exprId == rnAlias.exprId => v - 1
      case GreaterThanOrEqual(Literal(v: Int, IntegerType), a: Attribute)
          if a.exprId == rnAlias.exprId => v
      // rn = 1 is the reference's DEDUPLICATE shape
      // (FlinkLogicalRankRule routes it to StreamExecDeduplicate:
      // keep-first when the time attribute orders ascending, keep-last
      // descending). Top-1 of the same state op has exactly those
      // update semantics, so it shares the operator. rn = k for k > 1
      // selects a single interior rank and stays unsupported, as in
      // the reference.
      case EqualTo(a: Attribute, Literal(1, IntegerType))
          if a.exprId == rnAlias.exprId => 1
      case EqualTo(Literal(1, IntegerType), a: Attribute)
          if a.exprId == rnAlias.exprId => 1
      case _ => return None
    }
    if (n <= 0) return None
    // one or more partition attributes (composite keys group by the
    // length-prefixed string form built below)
    val partIdx: Seq[Int] = w.partitionSpec.map {
      case a: Attribute =>
        val i = w.child.output.indexWhere(_.exprId == a.exprId)
        if (i < 0) return None
        i
      case _ => return None
    }
    if (partIdx.isEmpty) return None
    val child = w.child
    // order columns, each with its direction, compare mode, and null
    // placement:
    // 0 = integral (exact 64-bit), 1 = fractional (double),
    // 2 = naturally Comparable external type (timestamps/dates
    //     — the reference's Deduplicate orders by a TIME ATTRIBUTE, so
    //     rn = 1 over `ORDER BY rowtime` must resolve),
    // 3 = string, compared in UTF8String binary (code-point) order —
    //     java.lang.String.compareTo is UTF-16 code-unit order, which
    //     diverges from Spark's ROW_NUMBER sort on non-BMP code points
    val orderIdx: Seq[(Int, Boolean, Int, Boolean)] = w.orderSpec.map {
      case SortOrder(a: Attribute, dir, nullOrd, _)
          if child.output.exists(_.exprId == a.exprId) &&
            (a.dataType.isInstanceOf[NumericType] ||
              Seq(TimestampType, TimestampNTZType, DateType, StringType)
                .contains(a.dataType)) =>
        val mode =
          if (Seq(ByteType, ShortType, IntegerType, LongType).contains(a.dataType)) 0
          else if (a.dataType.isInstanceOf[NumericType]) 1
          else if (a.dataType == StringType) 3
          else 2
        (child.output.indexWhere(_.exprId == a.exprId), dir == Ascending,
          mode, nullOrd == NullsFirst)
      case _ => return None
    }

    val df = org.apache.spark.sql.graft.SqlShim.ofRows(session, child)
    val outSchema = StructType(child.schema.fields :+
      StructField(rnAlias.name, IntegerType, nullable = false))
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    implicit val stEnc: Encoder[List[Row]] = Encoders.kryo[List[Row]]
    implicit val outEnc: Encoder[Row] = Encoders.row(outSchema)
    val ord: Ordering[Row] = (x: Row, y: Row) => {
      var i = 0
      var c = 0
      while (c == 0 && i < orderIdx.length) {
        val (idx, asc, mode, nullsFirst) = orderIdx(i)
        val xn = x.isNullAt(idx)
        val yn = y.isNullAt(idx)
        if (xn || yn) {
          // SQL null placement is absolute (NULLS FIRST puts nulls
          // first regardless of ASC/DESC), so it must NOT go through
          // the direction flip below
          c = if (xn && yn) 0
              else if (xn) { if (nullsFirst) -1 else 1 }
              else { if (nullsFirst) 1 else -1 }
        } else {
          // 64-bit ids above 2^53 collapse under a double compare, which
          // would break the unique-tiebreaker contract — compare integral
          // columns exactly.
          c = mode match {
            case 0 =>
              java.lang.Long.compare(
                x.get(idx).asInstanceOf[Number].longValue,
                y.get(idx).asInstanceOf[Number].longValue)
            case 1 =>
              java.lang.Double.compare(
                x.get(idx).asInstanceOf[Number].doubleValue,
                y.get(idx).asInstanceOf[Number].doubleValue)
            case 3 =>
              // match Spark's binary string order (UTF-8 byte compare)
              org.apache.spark.unsafe.types.UTF8String
                .fromString(x.getString(idx))
                .compareTo(org.apache.spark.unsafe.types.UTF8String
                  .fromString(y.getString(idx)))
            case _ =>
              x.get(idx).asInstanceOf[Comparable[Any]].compareTo(y.get(idx))
          }
          if (!asc) c = -c
        }
        i += 1
      }
      c
    }
    // composite keys: length-prefixed parts (a separator-joined form
    // would collide when a part itself contains the separator, and a
    // null part with the literal string "null")
    val updates = df.groupByKey(r =>
      partIdx.map { i =>
        val v = String.valueOf(r.get(i))
        (if (r.isNullAt(i)) "n" else "v") + v.length + ":" + v
      }.mkString)
      .flatMapGroupsWithState[List[Row], Row](OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (_, it, state) =>
          val old = state.getOption.getOrElse(Nil)
          val merged = (old ++ it.toList).distinct.sorted(ord).take(n)
          state.update(merged)
          if (merged != old)
            merged.iterator.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ (i + 1)) }
          else Iterator.empty
      }
    // splice back with the ORIGINAL output attribute ids, so everything
    // above the rewritten Filter still resolves
    // positional splice: the state op's schema is child.output fields
    // in order plus rn last, so bind each pass-through attribute by
    // its ORDINAL in child.output (name lookup would bind the wrong
    // attribute when the child carries duplicate names, legal after
    // self-joins)
    val newOut = updates.queryExecution.analyzed.output
    val aliases: Seq[NamedExpression] = f.output.map { orig =>
      val src =
        if (orig.exprId == rnAlias.exprId) newOut.last
        else {
          val i = child.output.indexWhere(_.exprId == orig.exprId)
          if (i < 0) return None
          newOut(i)
        }
      Alias(src, orig.name)(exprId = orig.exprId)
    }
    Some(Project(aliases, updates.queryExecution.analyzed))
  }
}
