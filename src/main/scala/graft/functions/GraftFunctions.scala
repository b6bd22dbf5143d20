package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._

/**
 * SQL function registry for the gap functions (SURVEY §2.8), matching
 * the reference's operator-table names (`FlinkSqlOperatorTable.java`).
 * Functions Spark can already express are COMPOSED from built-in
 * codegen'd expressions at registration time (SURVEY §7.2 preference
 * (a)); only the genuine gaps get custom Expression classes.
 *
 * Use either `GraftFunctions.register(spark)` at runtime, or configure
 * `spark.sql.extensions=graft.functions.GraftExtensions`.
 */
object GraftFunctions {

  private def info(name: String) =
    new ExpressionInfo(classOf[IsDecimal].getName, name)

  /** (s1,e1) overlaps (s2,e2), endpoints normalized and inclusive —
   * the reference's TEMPORAL_OVERLAPS, composed from built-ins. */
  private def temporalOverlaps(es: Seq[Expression]): Expression = {
    require(es.length == 4, "temporal_overlaps(s1, e1, s2, e2)")
    val Seq(s1, e1, s2, e2) = es
    And(
      LessThanOrEqual(Least(Seq(s1, e1)), Greatest(Seq(s2, e2))),
      LessThanOrEqual(Least(Seq(s2, e2)), Greatest(Seq(s1, e1))))
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "is_decimal" -> (es => IsDecimal(es.head)),
    "is_digit" -> (es => IsDigit(es.head)),
    "is_alpha" -> (es => IsAlpha(es.head)),
    "is_json_value" -> (es => IsJsonPredicate(es.head, "value")),
    "is_json_object" -> (es => IsJsonPredicate(es.head, "object")),
    "is_json_array" -> (es => IsJsonPredicate(es.head, "array")),
    "is_json_scalar" -> (es => IsJsonPredicate(es.head, "scalar")),
    "split_index" -> (es => SplitIndex(es(0), es(1), es(2))),
    "temporal_overlaps" -> temporalOverlaps,
    // HASH_CODE ≡ Spark's Murmur3 hash; RAND_INTEGER(n) = floor(rand()*n)
    "hash_code" -> (es => Murmur3Hash(es, 42)),
    "rand_integer" -> (es =>
      Cast(Floor(Multiply(new Rand(), Cast(es.head, org.apache.spark.sql.types.DoubleType))),
        org.apache.spark.sql.types.IntegerType)),
    // FOR SYSTEM_TIME AS OF marker (temporal join): resolvable but
    // unevaluable — StreamTemporalJoinRule must plan it away
    "system_time_as_of" -> (es => SystemTimeAsOf(es(0), es(1), es(2))),
    // TRUNCATE(numeric[, n]) — reference BuiltInFunctionDefinitions
    // TRUNCATE (SqlStdOperatorTable.TRUNCATE): toward-zero truncation
    // at n decimal places. Composed from codegen'd built-ins:
    // floor for non-negative, ceiling for negative (= trunc toward 0).
    // All-double arithmetic is IEEE-identical across engines.
    "truncate" -> (es => {
      require(es.nonEmpty && es.length <= 2, "truncate(x[, n])")
      import org.apache.spark.sql.types.DoubleType
      val x = Cast(es.head, DoubleType)
      val p = Pow(Literal(10.0),
        Cast(es.drop(1).headOption.getOrElse(Literal(0)), DoubleType))
      val y = Multiply(x, p)
      Divide(
        Cast(If(GreaterThanOrEqual(x, Literal(0.0)), Floor(y), Ceil(y)), DoubleType),
        p)
    }),
    // SIMILAR TO (reference StringCallGen.scala:74): the SQL pattern
    // translates to an anchored Java regex at plan time (the pattern
    // must be a literal), then lowers onto codegen'd RLike
    "similar_to" -> (es => {
      def litStr(e: Expression, what: String): String = e match {
        case l if l.foldable =>
          Option(l.eval(null)).map(_.toString)
            .getOrElse(throw new IllegalArgumentException(s"similar_to: $what must not be NULL"))
        case _ =>
          throw new IllegalArgumentException(s"similar_to: $what must be a literal")
      }
      val escape = es.drop(2).headOption.map { e =>
        val s = litStr(e, "escape")
        require(s.length == 1, "similar_to: escape must be one character")
        s.charAt(0)
      }
      val regex = graft.sqlx.SimilarToSql.toJavaRegex(litStr(es(1), "pattern"), escape)
      RLike(es(0), Literal(regex))
    })
  )

  /** Runtime registration on an existing session (idempotent). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      reg.registerFunction(FunctionIdentifier(name), info(name), b)
    }
  }
}

/** `spark.sql.extensions` entry point — injects the gap functions into
 * every session built with these extensions. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, b) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[IsDecimal].getName, name), b))
    }
    // off unless spark.graft.distinctAggSplit.buckets > 0
    ext.injectOptimizerRule(_ => graft.rules.SplitDistinctAggRule())
    // streaming ROW_NUMBER() <= N → keyed Top-N state op; must run in
    // ANALYSIS, before the streaming unsupported-operation check sees
    // the Window node (reference FlinkLogicalRankRule)
    ext.injectPostHocResolutionRule(s => graft.rules.StreamRankToTopNRule(s))
    // streaming OVER aggregates (SUM/COUNT/MIN/MAX/AVG over bounded or
    // unbounded preceding frames) → keyed watermark-released state op
    // (reference StreamExecOverAggregate)
    ext.injectPostHocResolutionRule(s => graft.rules.StreamOverAggRule(s))
    // FOR SYSTEM_TIME AS OF marked join → versioned-join state op
    // (reference LogicalCorrelateToJoinFromTemporalTableRule)
    ext.injectPostHocResolutionRule(s => graft.rules.StreamTemporalJoinRule(s))
  }
}
