package graft.api

import graft.sqlx.SqlLexer
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, expr}

/**
 * The reference's fluent Table API (`flink-table-api-java/.../Table.java`:
 * select/filter/groupBy/join/orderBy/limit and the set ops), in its
 * STRING-EXPRESSION form (`table.select("a, b + 1 as c")` —
 * `ExpressionParser.java`): every method is a thin veneer over the
 * DataFrame API, so plans are identical to writing Spark directly.
 * Expression strings parse through Catalyst's own `expr`; lists split
 * on top-level commas only ([[SqlLexer.splitTop]]), so literals and
 * nested calls never mis-split.
 *
 * Obtain one via [[TableEnv.from]] (registered view) or
 * [[TableEnv.fromDataFrame]].
 */
final class Table(val df: DataFrame) {

  private def items(exprs: String): Seq[String] =
    SqlLexer.splitTop(exprs).map(_.trim).filter(_.nonEmpty)

  /** Reference `Table.select("a, b + 1 AS c")`. */
  def select(exprs: String): Table = new Table(df.selectExpr(items(exprs): _*))

  /** Reference `Table.filter` / `Table.where`. */
  def filter(predicate: String): Table = new Table(df.filter(predicate))
  def where(predicate: String): Table = filter(predicate)

  /** Reference `Table.as("x, y, z")` — positional rename. */
  def as(names: String): Table = new Table(df.toDF(items(names): _*))

  /** Reference `Table.addColumns("e AS name, …")`. */
  def addColumns(exprs: String): Table =
    new Table(items(exprs).foldLeft(df) { (d, e) =>
      val (body, name) = splitAlias(e)
      d.withColumn(name.getOrElse(
        throw new IllegalArgumentException(s"addColumns needs 'expr AS name', got: $e")),
        expr(body))
    })

  /** Reference `Table.dropColumns("a, b")`. */
  def dropColumns(names: String): Table = new Table(df.drop(items(names): _*))

  /** Reference `Table.renameColumns("a AS b, …")`. */
  def renameColumns(mappings: String): Table =
    new Table(items(mappings).foldLeft(df) { (d, m) =>
      val (from, to) = splitAlias(m)
      d.withColumnRenamed(from, to.getOrElse(
        throw new IllegalArgumentException(s"renameColumns needs 'old AS new', got: $m")))
    })

  /** Reference joins: inner/left/right/full with an ON expression. */
  def join(right: Table, condition: String): Table =
    new Table(df.join(right.df, expr(condition)))
  def leftOuterJoin(right: Table, condition: String): Table =
    new Table(df.join(right.df, expr(condition), "left_outer"))
  def rightOuterJoin(right: Table, condition: String): Table =
    new Table(df.join(right.df, expr(condition), "right_outer"))
  def fullOuterJoin(right: Table, condition: String): Table =
    new Table(df.join(right.df, expr(condition), "full_outer"))

  /** Reference set ops (`union` deduplicates, as SQL UNION). */
  def union(other: Table): Table = new Table(df.union(other.df).distinct())
  def unionAll(other: Table): Table = new Table(df.union(other.df))
  def intersect(other: Table): Table = new Table(df.intersect(other.df))
  def intersectAll(other: Table): Table = new Table(df.intersectAll(other.df))
  def minus(other: Table): Table = new Table(df.except(other.df))
  def minusAll(other: Table): Table = new Table(df.exceptAll(other.df))

  def distinct(): Table = new Table(df.distinct())

  /** Reference `Table.groupBy("k1, k2")`. */
  def groupBy(keys: String): GroupedTable = new GroupedTable(df, items(keys))

  /** Reference `Table.orderBy("a.asc, b.desc")` — Flink's field.asc /
   * field.desc suffix form (plain names default ascending). */
  def orderBy(fields: String): Table = {
    val sorts: Seq[Column] = items(fields).map {
      case s if s.toLowerCase.endsWith(".desc") => col(s.dropRight(5)).desc
      case s if s.toLowerCase.endsWith(".asc") => col(s.dropRight(4)).asc
      case s => col(s).asc
    }
    new Table(df.orderBy(sorts: _*))
  }

  /** Reference `Table.fetch(n)` / `limit`. */
  def fetch(n: Int): Table = new Table(df.limit(n))
  def limit(n: Int): Table = fetch(n)

  def toDataFrame: DataFrame = df

  private def splitAlias(e: String): (String, Option[String]) = {
    val m = """(?is)^(.*\S)\s+AS\s+([A-Za-z_][A-Za-z0-9_]*)$""".r
    e match {
      case m(body, name) => (body, Some(name))
      case _ => (e, None)
    }
  }
}

/** Reference `GroupedTable`: `groupBy(...).select("k, agg(x) AS a")` —
 * the select list mixes grouping keys and aggregate expressions. */
final class GroupedTable(df: DataFrame, keys: Seq[String]) {

  def select(exprs: String): Table = {
    val items = SqlLexer.splitTop(exprs).map(_.trim).filter(_.nonEmpty)
    // key references match case-insensitively, as Spark's resolver does
    def isKey(i: String): Boolean = keys.exists(_.equalsIgnoreCase(i))
    val aggs = items.filterNot(isKey)
    require(aggs.nonEmpty,
      "groupBy().select() needs at least one aggregate expression")
    val agged = df.groupBy(keys.map(col): _*).agg(expr(aggs.head), aggs.drop(1).map(expr): _*)
    // re-project in the select list's order (keys keep their declared
    // name, aggregates surface under their alias — Spark names the
    // column by the alias when present, by the expression text otherwise)
    val outNames = items.map { i =>
      if (isKey(i)) keys.find(_.equalsIgnoreCase(i)).get
      else """(?is)^.*\s+AS\s+([A-Za-z_][A-Za-z0-9_]*)$""".r
        .findFirstMatchIn(i).map(_.group(1)).getOrElse(i)
    }
    new Table(agged.selectExpr(outNames.map(n => s"`$n`"): _*))
  }
}
