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

  /** FLIP-29 row-based `Table.map` (reference `Table.java:314` in
   * 1.14): the scalar-function call's output REPLACES the row — a
   * struct-returning function expands to one column per field, an
   * atomic result becomes the single column `f0`. The call is a
   * registered function invocation in string form, optionally
   * `AS (names…)` to rename the output fields positionally. */
  def map(call: String): Table = {
    val (body, names) = RowOps.parse(call)
    new Table(RowOps.expand(df.select(expr(body).as("__m")), "__m", names, Nil))
  }

  /** FLIP-29 `Table.flatMap` (reference `Table.java:340`): a
   * table-function call — each collected element becomes its own row,
   * replacing the input row; struct elements expand per field. */
  def flatMap(call: String): Table = {
    val (body, names) = RowOps.parse(call)
    val ex = df.select(org.apache.spark.sql.functions.explode(expr(body)).as("__e"))
    new Table(RowOps.expand(ex, "__e", names, Nil))
  }

  /** Reference `Table.joinLateral(call)` (`Table.java:455`): correlate
   * each row with the table function's collected rows for it — rows
   * with an empty result drop (CROSS APPLY). */
  def joinLateral(call: String): Table = lateral(call, outer = false)

  /** Reference `Table.leftOuterJoinLateral` (`Table.java:489`): as
   * joinLateral, but rows with an empty function result survive with
   * null function columns (OUTER APPLY). */
  def leftOuterJoinLateral(call: String): Table = lateral(call, outer = true)

  private def lateral(call: String, outer: Boolean): Table = {
    val (body, names) = RowOps.parse(call)
    val ex = if (outer) org.apache.spark.sql.functions.explode_outer(expr(body))
             else org.apache.spark.sql.functions.explode(expr(body))
    val withE = df.withColumn("__e", ex)
    new Table(RowOps.expand(withE, "__e", names, df.columns.toSeq))
  }

  /** Reference `Table.groupBy("k1, k2")`. */
  def groupBy(keys: String): GroupedTable = new GroupedTable(df, items(keys))

  /** Reference `Table.window(Tumble.over("15.minutes").on("ts").as("w"))`
   * (`flink-table-api-java/.../api/Tumble.java:33`, `Slide.java:47`,
   * `Session.java:43`): the fluent group-window form of the Table API.
   * The window alias must appear in the subsequent `groupBy`, and the
   * select list may project `w.start` / `w.end`, as the reference's
   * window properties resolve. */
  def window(w: GroupWindowDef): WindowedTable = new WindowedTable(df, w)

  /** Reference `Table.window(Over.partitionBy("k").orderBy("ts")
   * .preceding("UNBOUNDED_RANGE").as("w")).select("k, sum(x) OVER w AS s")`
   * (`flink-table-api-java/.../api/Over.java:44`): the fluent OVER
   * window form. */
  def window(w: OverWindowDef): OverWindowedTable = new OverWindowedTable(df, w)

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

  /** Reference `Table.offset(n)` — meaningful after `orderBy`, as in
   * the reference (`orderBy(…).offset(o).fetch(n)`). */
  def offset(n: Int): Table = new Table(df.offset(n))

  def toDataFrame: DataFrame = df

  private def splitAlias(e: String): (String, Option[String]) = {
    val m = """(?is)^(.*\S)\s+AS\s+([A-Za-z_][A-Za-z0-9_]*)$""".r
    e match {
      case m(body, name) => (body, Some(name))
      case _ => (e, None)
    }
  }
}

/** A fluent group-window definition (`Tumble`/`Slide`/`Session`
 * `.over/withGap(…).on(ts).as(alias)`). Durations use the reference's
 * string-expression spelling `'n.unit'` (e.g. "15.minutes"). */
sealed trait GroupWindowDef {
  def tsCol: String
  def alias: String
  /** The Spark grouping column realizing this window. */
  private[api] def sparkWindow: Column
}
private[api] object GroupWindowDef {
  /** "15.minutes" → "15 minutes" (reference ExpressionParser duration
   * literals; milli/second/minute/hour/day units, loud otherwise). */
  def duration(s: String): String = {
    val m = """(?i)^\s*(\d+)\.(millis?|seconds?|minutes?|hours?|days?)\s*$""".r
    s match {
      case m(n, u) =>
        val unit = u.toLowerCase match {
          case "milli" | "millis" => "milliseconds"
          case x if x.endsWith("s") => x
          case x => x + "s"
        }
        s"$n $unit"
      case _ => throw new IllegalArgumentException(
        s"expected a duration like '15.minutes', got: '$s' " +
        "(row-count windows are not supported in this facade)")
    }
  }
}

object Tumble {
  /** Reference `Tumble.over("15.minutes")`. */
  def over(size: String): TumbleWithSize = new TumbleWithSize(size)
}
final class TumbleWithSize(size: String) {
  def on(ts: String): TumbleOnTime = new TumbleOnTime(size, ts)
}
final class TumbleOnTime(size: String, ts: String) {
  def as(name: String): GroupWindowDef = new GroupWindowDef {
    val tsCol = ts; val alias = name
    private[api] def sparkWindow =
      org.apache.spark.sql.functions.window(col(ts), GroupWindowDef.duration(size))
  }
}

object Slide {
  /** Reference `Slide.over("30.minutes").every("10.minutes")`. */
  def over(size: String): SlideWithSize = new SlideWithSize(size)
}
final class SlideWithSize(size: String) {
  def every(slide: String): SlideWithSlide = new SlideWithSlide(size, slide)
}
final class SlideWithSlide(size: String, slide: String) {
  def on(ts: String): SlideOnTime = new SlideOnTime(size, slide, ts)
}
final class SlideOnTime(size: String, slide: String, ts: String) {
  def as(name: String): GroupWindowDef = new GroupWindowDef {
    val tsCol = ts; val alias = name
    private[api] def sparkWindow = org.apache.spark.sql.functions.window(
      col(ts), GroupWindowDef.duration(size), GroupWindowDef.duration(slide))
  }
}

object Session {
  /** Reference `Session.withGap("10.minutes")`. */
  def withGap(gap: String): SessionWithGap = new SessionWithGap(gap)
}
final class SessionWithGap(gap: String) {
  def on(ts: String): SessionOnTime = new SessionOnTime(gap, ts)
}
final class SessionOnTime(gap: String, ts: String) {
  def as(name: String): GroupWindowDef = new GroupWindowDef {
    val tsCol = ts; val alias = name
    private[api] def sparkWindow = org.apache.spark.sql.functions
      .session_window(col(ts), GroupWindowDef.duration(gap))
  }
}

/** Fluent OVER window (reference `Over.java:44`): partitionBy →
 * orderBy → preceding → as. Preceding spellings: `UNBOUNDED_RANGE`
 * (the default RANGE running frame), `UNBOUNDED_ROW`, or `'n.rows'`
 * (bounded ROWS frame); following is always the reference default
 * CURRENT_RANGE / CURRENT_ROW. */
object Over {
  def partitionBy(keys: String): OverPartitioned = new OverPartitioned(keys)
}
final class OverPartitioned(keys: String) {
  def orderBy(order: String): OverOrdered = new OverOrdered(keys, order)
}
final class OverOrdered(keys: String, order: String) {
  def preceding(p: String): OverPreceding = new OverPreceding(keys, order, p)
  /** No explicit frame = the reference default, UNBOUNDED_RANGE. */
  def as(name: String): OverWindowDef = preceding("UNBOUNDED_RANGE").as(name)
}
final class OverPreceding(keys: String, order: String, p: String) {
  def as(name: String): OverWindowDef = {
    val spec0 = org.apache.spark.sql.expressions.Window
      .partitionBy(SqlLexer.splitTop(keys).map(_.trim).filter(_.nonEmpty).map(col): _*)
      .orderBy(SqlLexer.splitTop(order).map(_.trim).filter(_.nonEmpty).map {
        case s if s.toLowerCase.endsWith(".desc") => col(s.dropRight(5)).desc
        case s if s.toLowerCase.endsWith(".asc") => col(s.dropRight(4)).asc
        case s => col(s).asc
      }: _*)
    val rows = """(?i)^\s*(\d+)\.rows\s*$""".r
    val spec = p.trim.toUpperCase match {
      case "UNBOUNDED_RANGE" => spec0.rangeBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
      case "UNBOUNDED_ROW" => spec0.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
      case _ => p.trim match {
        case rows(n) => spec0.rowsBetween(-n.toLong,
          org.apache.spark.sql.expressions.Window.currentRow)
        case other => throw new IllegalArgumentException(
          s"preceding: expected UNBOUNDED_RANGE, UNBOUNDED_ROW or 'n.rows', got: $other")
      }
    }
    new OverWindowDef(name, spec)
  }
}
final class OverWindowDef(val alias: String,
    private[api] val spec: org.apache.spark.sql.expressions.WindowSpec)

/** Reference `OverWindowedTable`: select items may carry an
 * `agg OVER w` suffix, which applies the named window to the
 * aggregate. */
final class OverWindowedTable(df: DataFrame, w: OverWindowDef) {
  def select(exprs: String): Table = {
    val items = SqlLexer.splitTop(exprs).map(_.trim).filter(_.nonEmpty)
    val overRe = (s"""(?is)^(.*\\S)\\s+OVER\\s+""" +
      java.util.regex.Pattern.quote(w.alias) +
      """(?:\s+AS\s+([A-Za-z_][A-Za-z0-9_]*))?$""").r
    val cols: Seq[Column] = items.map {
      case overRe(agg, alias) =>
        val c = expr(agg).over(w.spec)
        if (alias != null) c.as(alias) else c.as(agg)
      case plain => expr(plain)
    }
    new Table(df.select(cols: _*))
  }
}

/** Reference `WindowedTable` → `WindowGroupedTable`: groupBy must name
 * the window alias; select mixes keys, `alias.start`/`alias.end`
 * window properties, and aggregates. */
final class WindowedTable(df: DataFrame, w: GroupWindowDef) {
  def groupBy(keys: String): WindowGroupedTable = {
    val ks = SqlLexer.splitTop(keys).map(_.trim).filter(_.nonEmpty)
    require(ks.exists(_.equalsIgnoreCase(w.alias)),
      s"window alias '${w.alias}' must appear in groupBy, got: $keys")
    new WindowGroupedTable(df, w, ks.filterNot(_.equalsIgnoreCase(w.alias)))
  }
}

final class WindowGroupedTable(df: DataFrame, w: GroupWindowDef, keys: Seq[String]) {
  def select(exprs: String): Table = {
    val items = SqlLexer.splitTop(exprs).map(_.trim).filter(_.nonEmpty)
    def isKey(i: String): Boolean = keys.exists(_.equalsIgnoreCase(i))
    val prop = s"""(?is)^${java.util.regex.Pattern.quote(w.alias)}\\.(start|end)(?:\\s+AS\\s+([A-Za-z_][A-Za-z0-9_]*))?$$""".r
    def isProp(i: String): Boolean = prop.findFirstIn(i).isDefined
    val aggs = items.filterNot(i => isKey(i) || isProp(i))
    require(aggs.nonEmpty,
      "window groupBy select needs at least one aggregate expression")
    val agged = df
      .groupBy(w.sparkWindow.as("__gw") +: keys.map(col): _*)
      .agg(expr(aggs.head), aggs.drop(1).map(expr): _*)
    val out = items.map {
      case i if isKey(i) => s"`${keys.find(_.equalsIgnoreCase(i)).get}`"
      case prop(p, alias) =>
        s"__gw.$p AS ${Option(alias).getOrElse(p)}"
      case i =>
        val n = """(?is)^.*\s+AS\s+([A-Za-z_][A-Za-z0-9_]*)$""".r
          .findFirstMatchIn(i).map(_.group(1)).getOrElse(i)
        s"`$n`"
    }
    new Table(agged.selectExpr(out: _*))
  }
}

/** Shared mechanics of the FLIP-29 row-based ops: `"f(a) AS (x, y)"`
 * call parsing and struct-output expansion. */
private[api] object RowOps {
  import org.apache.spark.sql.types.StructType
  private val asParen = """(?is)^(.*?)\s+AS\s*\(([^)]*)\)\s*$""".r
  private val asOne = """(?is)^(.*\S)\s+AS\s+([A-Za-z_][A-Za-z0-9_]*)$""".r

  /** Split "f(x) AS (a, b)" — or "f(x) AS a" — into (call body,
   * positional output names; empty = keep the function's own). */
  def parse(call: String): (String, Seq[String]) = call.trim match {
    case asParen(b, ns) => (b, SqlLexer.splitTop(ns).map(_.trim).filter(_.nonEmpty))
    case asOne(b, n) => (b, Seq(n))
    case c => (c, Nil)
  }

  /** Expand column `c` (struct → one column per field, atomic → one
   * column named "f0"), renamed positionally by `names` when given,
   * with `keep` input columns in front. */
  def expand(df: DataFrame, c: String, names: Seq[String], keep: Seq[String]): DataFrame = {
    val out = df.schema(c).dataType match {
      case st: StructType =>
        val fs = st.fields.map(_.name).toSeq
        require(names.isEmpty || names.length == fs.length,
          s"AS(...) names ${names.length} fields but the function emits ${fs.length}")
        fs.zipWithIndex.map { case (f, i) =>
          col(c).getField(f).as(names.lift(i).getOrElse(f)) }
      case _ => Seq(col(c).as(names.headOption.getOrElse("f0")))
    }
    df.select(keep.map(col) ++ out: _*)
  }
}

/** FLIP-29 `groupBy(...).aggregate(call).select(...)` (reference
 * `Table.java:585` → `AggregatedTable`): the aggregate-function call
 * runs once per group; a struct result expands per field. */
final class AggregatedTable private[api] (df: DataFrame, keys: Seq[String], call: String) {
  def select(exprs: String): Table = {
    val (body, names) = RowOps.parse(call)
    val agged = df.groupBy(keys.map(col): _*).agg(expr(body).as("__a"))
    new Table(RowOps.expand(agged, "__a", names, keys)).select(exprs)
  }
}

/** FLIP-29 `groupBy(...).flatAggregate(call).select(...)` (reference
 * `Table.java:619` → `FlatAggregateTable`): a table-aggregate call
 * emitting 0..n rows per group — the emitted collection explodes into
 * rows after the aggregation. */
final class FlatAggregatedTable private[api] (df: DataFrame, keys: Seq[String], call: String) {
  def select(exprs: String): Table = {
    val (body, names) = RowOps.parse(call)
    val agged = df.groupBy(keys.map(col): _*).agg(expr(body).as("__ta"))
      .select(keys.map(col) :+
        org.apache.spark.sql.functions.explode(col("__ta")).as("__e"): _*)
    new Table(RowOps.expand(agged, "__e", names, keys)).select(exprs)
  }
}

/** Reference `GroupedTable`: `groupBy(...).select("k, agg(x) AS a")` —
 * the select list mixes grouping keys and aggregate expressions. */
final class GroupedTable(df: DataFrame, keys: Seq[String]) {

  /** FLIP-29 row-based aggregate — see [[AggregatedTable]]. */
  def aggregate(call: String): AggregatedTable = new AggregatedTable(df, keys, call)

  /** FLIP-29 row-based table aggregate — see [[FlatAggregatedTable]]. */
  def flatAggregate(call: String): FlatAggregatedTable = new FlatAggregatedTable(df, keys, call)

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
