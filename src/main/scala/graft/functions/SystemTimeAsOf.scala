package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, Unevaluable}
import org.apache.spark.sql.types.{BooleanType, DataType}

/**
 * Marker predicate for `FOR SYSTEM_TIME AS OF` temporal joins — the
 * analog of the reference's `LogicalSnapshot` node
 * (`flink-table-planner/.../plan/rules/logical/LogicalCorrelateToJoinFromTemporalTableRule.scala`):
 * the SQL front-end (`graft.sqlx.TemporalSql`) desugars the clause into
 * a plain join whose condition carries
 * `SYSTEM_TIME_AS_OF(dimTime, dimSeq, probeTime)`, and the analysis
 * rule (`graft.rules.StreamTemporalJoinRule`) recognizes it and plans
 * the whole join into the versioned-join state operator.
 *
 * Deliberately `Unevaluable`: like the reference's snapshot relation, a
 * temporal join that no rule converted is an error, not a silent
 * fallback to all-versions-at-or-before semantics.
 */
case class SystemTimeAsOf(dimTime: Expression, dimSeq: Expression, probeTime: Expression)
    extends Expression with Unevaluable {

  override def children: Seq[Expression] = Seq(dimTime, dimSeq, probeTime)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "system_time_as_of"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(dimTime = newChildren(0), dimSeq = newChildren(1), probeTime = newChildren(2))
}
