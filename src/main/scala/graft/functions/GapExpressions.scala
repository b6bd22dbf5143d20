package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expressions for the scalar functions the reference
 * has and Spark lacks (SURVEY §2.8 gaps). Each implements `doGenCode`
 * calling a static helper, so they stay inside WholeStageCodegen — the
 * preference order of SURVEY §7.2 (custom Expression over UDF).
 */
abstract class StringPredicate extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string argument")
  override def dataType: DataType = BooleanType
  /** NULL input → false (the reference predicates are null-rejecting,
   * not null-propagating). */
  override def nullable: Boolean = false
  protected def helperName: String
  protected def call(s: UTF8String): Boolean

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) false else call(v.asInstanceOf[UTF8String])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        boolean ${ev.value} = false;
        if (!${c.isNull}) {
          ${ev.value} = graft.functions.GapFnUtils.$helperName(${c.value});
        }""",
      isNull = FalseLiteral)
  }
}

case class IsDecimal(child: Expression) extends StringPredicate {
  override protected def helperName: String = "isDecimal"
  override protected def call(s: UTF8String): Boolean = GapFnUtils.isDecimal(s)
  override def prettyName: String = "is_decimal"
  override protected def withNewChildInternal(newChild: Expression): IsDecimal =
    copy(child = newChild)
}

case class IsDigit(child: Expression) extends StringPredicate {
  override protected def helperName: String = "isDigit"
  override protected def call(s: UTF8String): Boolean = GapFnUtils.isDigit(s)
  override def prettyName: String = "is_digit"
  override protected def withNewChildInternal(newChild: Expression): IsDigit =
    copy(child = newChild)
}

case class IsAlpha(child: Expression) extends StringPredicate {
  override protected def helperName: String = "isAlpha"
  override protected def call(s: UTF8String): Boolean = GapFnUtils.isAlpha(s)
  override def prettyName: String = "is_alpha"
  override protected def withNewChildInternal(newChild: Expression): IsAlpha =
    copy(child = newChild)
}

case class IsJsonPredicate(child: Expression, kind: String) extends StringPredicate {
  override protected def helperName: String = kind match {
    case "value" => "isJsonValue"
    case "object" => "isJsonObject"
    case "array" => "isJsonArray"
    case "scalar" => "isJsonScalar"
  }
  override protected def call(s: UTF8String): Boolean = kind match {
    case "value" => GapFnUtils.isJsonValue(s)
    case "object" => GapFnUtils.isJsonObject(s)
    case "array" => GapFnUtils.isJsonArray(s)
    case "scalar" => GapFnUtils.isJsonScalar(s)
  }
  override def prettyName: String = s"is_json_$kind"
  override protected def withNewChildInternal(newChild: Expression): IsJsonPredicate =
    copy(child = newChild)
}

/** SPLIT_INDEX(str, sep, index): 0-based element of the literal split,
 * NULL out of range — the reference's contract; Spark's
 * `split(s, re)[i]` errors or needs `element_at` with 1-base and regex
 * separators, so this is a genuine gap expression. */
case class SplitIndex(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == StringType && second.dataType == StringType &&
        third.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "split_index requires (string, string, int) arguments")
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "split_index"

  override protected def nullSafeEval(s: Any, d: Any, i: Any): Any =
    GapFnUtils.splitIndex(s.asInstanceOf[UTF8String], d.asInstanceOf[UTF8String],
      i.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, d, i) => s"""
      ${ev.value} = graft.functions.GapFnUtils.splitIndex($s, $d, $i);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): SplitIndex =
    copy(first = newFirst, second = newSecond, third = newThird)
}
