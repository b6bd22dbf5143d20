package graft.rules

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.SystemTimeAsOf

/**
 * SQL-transparent streaming temporal join: rewrite
 *
 *   Join(probe, dim, Inner|LeftOuter,
 *        probeKey = dimKey AND SYSTEM_TIME_AS_OF(dimTime, dimSeq, probeTime))
 *
 * — the analyzed shape `graft.sqlx.TemporalSql` desugars
 * `FROM probe p JOIN dim FOR SYSTEM_TIME AS OF p.ts AS d ON p.k = d.k`
 * into — onto the versioned-join state operator
 * (`graft.streaming.TemporalJoinRows`). This is the analog of the
 * reference's `LogicalCorrelateToJoinFromTemporalTableRule` +
 * `StreamExecTemporalJoin`
 * (`flink-table-planner/.../plan/rules/logical/LogicalCorrelateToJoinFromTemporalTableRule.scala`,
 * `exec/stream/StreamExecTemporalJoin.java:67`): the parser produces a
 * marked join, the planner rule turns it into the temporal-join
 * operator, and an unconverted marker is an execution-time error
 * (`SystemTimeAsOf` is `Unevaluable`), never a silent semantics change.
 *
 * Shape requirements (anything else is left untouched): both sides
 * streaming; join type INNER or LEFT OUTER with the probe on the left;
 * exactly one equi-key conjunct plus the marker; marker arguments are
 * plain attributes (dim time + seq from the right side, probe time from
 * the left).
 *
 * Registered via `GraftExtensions` as a post-hoc resolution rule — it
 * must run during ANALYSIS, before the streaming
 * UnsupportedOperationChecker rejects the stream-stream join shape.
 *
 * Watermark delay is read from `spark.graft.temporalJoin.watermarkDelay`
 * (default "1 hour" — the bounded-gate harness drives the final flush
 * with far-future sentinels, so the delay only bounds state, as the
 * reference's watermark lag does).
 */
case class StreamTemporalJoinRule(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // streaming×streaming → versioned-join state op; batch×batch → the
    // as-of window formulation (the reference's batch temporal join).
    // Mixed boundedness is left untouched (and then fails loudly on
    // the unevaluable marker).
    case j @ Join(_, _, _, Some(cond), _)
        if j.left.isStreaming == j.right.isStreaming &&
          cond.exists(_.isInstanceOf[SystemTimeAsOf]) =>
      rewrite(j, cond).getOrElse(j)
  }

  private def stripCast(e: Expression): Expression = e match {
    case Cast(c, _, _, _) => stripCast(c)
    case other => other
  }

  private def rewrite(j: Join, cond: Expression): Option[LogicalPlan] = {
    if (j.joinType != Inner && j.joinType != LeftOuter) return None
    val conjuncts = splitConjuncts(cond)
    val (markers, rest) = conjuncts.partition(_.isInstanceOf[SystemTimeAsOf])
    val (dimTime, dimSeq, probeTime) = markers match {
      case Seq(SystemTimeAsOf(dt, ds, pt)) =>
        (stripCast(dt), stripCast(ds), stripCast(pt)) match {
          case (a: Attribute, b: Attribute, c: Attribute) => (a, b, c)
          case _ => return None
        }
      case _ => return None
    }
    val (probeKey, dimKey) = rest match {
      case Seq(EqualTo(a: Attribute, b: Attribute)) =>
        if (fromSide(j.left, a) && fromSide(j.right, b)) (a, b)
        else if (fromSide(j.left, b) && fromSide(j.right, a)) (b, a)
        else return None
      case _ => return None
    }
    // probe must be the LEFT child (the desugared `FROM probe JOIN dim
    // FOR SYSTEM_TIME AS OF probe.ts` always puts it there)
    if (!fromSide(j.left, probeTime) || !fromSide(j.right, dimTime) ||
        !fromSide(j.right, dimSeq)) return None

    val probeDf = org.apache.spark.sql.graft.SqlShim.ofRows(session, j.left)
    val dimDf = org.apache.spark.sql.graft.SqlShim.ofRows(session, j.right)
    val joined =
      if (j.left.isStreaming) {
        val delay = session.conf.getOption("spark.graft.temporalJoin.watermarkDelay")
          .getOrElse("1 hour")
        graft.streaming.TemporalJoinRows.run(
          probeDf, dimDf,
          probeKeyIdx = idx(j.left, probeKey), probeTimeIdx = idx(j.left, probeTime),
          dimKeyIdx = idx(j.right, dimKey), dimTimeIdx = idx(j.right, dimTime),
          dimSeqIdx = idx(j.right, dimSeq),
          leftOuter = j.joinType == LeftOuter, watermarkDelay = delay)
      } else
        graft.operators.AsOfJoinRows.run(
          probeDf, dimDf,
          probeKeyIdx = idx(j.left, probeKey), probeTimeIdx = idx(j.left, probeTime),
          dimKeyIdx = idx(j.right, dimKey), dimTimeIdx = idx(j.right, dimTime),
          dimSeqIdx = idx(j.right, dimSeq),
          leftOuter = j.joinType == LeftOuter)

    // splice back under the ORIGINAL join output attribute ids, so
    // everything above the rewritten Join still resolves
    val newPlan = joined.queryExecution.analyzed
    val origOut = j.left.output ++ j.right.output
    if (newPlan.output.length != origOut.length) return None
    val aliases: Seq[NamedExpression] = origOut.zip(newPlan.output).map {
      case (orig, nw) => Alias(nw, orig.name)(exprId = orig.exprId)
    }
    Some(Project(aliases, newPlan))
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  private def fromSide(side: LogicalPlan, a: Attribute): Boolean =
    side.output.exists(_.exprId == a.exprId)

  private def idx(side: LogicalPlan, a: Attribute): Int =
    side.output.indexWhere(_.exprId == a.exprId)
}
