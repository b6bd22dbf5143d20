package graft.queries

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Set operations (SURVEY.md §2.7): UNION ALL, UNION (distinct),
 * INTERSECT [ALL], EXCEPT [ALL]. Catalyst applies the same rewrites the
 * reference does (`ReplaceIntersectWithSemiJoinRule`,
 * `ReplaceMinusWithAntiJoinRule`, `RewriteIntersectAllRule`,
 * `RewriteMinusAllRule`): intersect/except become semi/anti joins,
 * the ALL variants become count-and-replicate joins — one shuffle each.
 */
object SetOpQueries extends QueryPack {

  private def sideA(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("k"), col("l_linenumber").as("ln"))

  private def sideB(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .filter(col("l_linestatus") === "F")
      .select(col("l_orderkey").as("k"), col("l_linenumber").as("ln"))

  private val aSql = "SELECT l_orderkey AS k, l_linenumber AS ln FROM lineitem WHERE l_returnflag = 'R'"
  private val bSql = "SELECT l_orderkey AS k, l_linenumber AS ln FROM lineitem WHERE l_linestatus = 'F'"

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "setop_union_all" -> ((s, dir) =>
      sideA(s, dir).unionAll(sideB(s, dir)).orderBy(col("k"), col("ln"))),

    "setop_union_distinct" -> ((s, dir) =>
      sideA(s, dir).union(sideB(s, dir)).distinct().orderBy(col("k"), col("ln"))),

    "setop_intersect" -> ((s, dir) =>
      sideA(s, dir).intersect(sideB(s, dir)).orderBy(col("k"), col("ln"))),

    "setop_intersect_all" -> ((s, dir) =>
      sideA(s, dir).intersectAll(sideB(s, dir)).orderBy(col("k"), col("ln"))),

    "setop_except" -> ((s, dir) =>
      sideA(s, dir).except(sideB(s, dir)).orderBy(col("k"), col("ln"))),

    "setop_except_all" -> ((s, dir) =>
      sideA(s, dir).exceptAll(sideB(s, dir)).orderBy(col("k"), col("ln")))
  )

  override def oracle: Map[String, String] = Map(
    "setop_union_all" -> s"($aSql) UNION ALL ($bSql) ORDER BY k, ln",
    "setop_union_distinct" -> s"($aSql) UNION ($bSql) ORDER BY k, ln",
    "setop_intersect" -> s"($aSql) INTERSECT ($bSql) ORDER BY k, ln",
    "setop_intersect_all" -> s"($aSql) INTERSECT ALL ($bSql) ORDER BY k, ln",
    "setop_except" -> s"($aSql) EXCEPT ($bSql) ORDER BY k, ln",
    "setop_except_all" -> s"($aSql) EXCEPT ALL ($bSql) ORDER BY k, ln"
  )
}
