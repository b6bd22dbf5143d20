package graft.sqlx

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * SQL-text window table-functions — the reference parses
 * `TUMBLE/HOP/CUMULATE(TABLE t, DESCRIPTOR(ts), INTERVAL ...)` in
 * query text (`flink-table-planner/.../functions/sql/FlinkSqlOperatorTable.java:1178-1181`)
 * and plans them as `StreamExecWindowTableFunction`
 * (`flink-table-planner/.../exec/stream/StreamExecWindowTableFunction.java:49`).
 * Spark's parser has no window TVFs, so — same recipe as
 * [[TemporalSql.desugar]] — this front-end rewrites the text into a
 * derived table Spark CAN parse, producing the TVF's `window_start` /
 * `window_end` columns alongside every source column:
 *
 * {{{
 * FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '15' MINUTE))
 *   -->
 * FROM (SELECT * EXCEPT (__w), __w.start AS window_start, __w.end AS window_end
 *       FROM (SELECT *, window(ts, '15 minutes') AS __w FROM events) __tvf)
 * }}}
 *
 * TUMBLE takes an optional 4th offset argument; HOP's argument order is
 * (slide, size) per the reference; CUMULATE (step, size) expands to the
 * slice-explode formulation of [[graft.operators.CumulateWindow]] — a
 * stateless map-side fan-out of size/step rows before the aggregation,
 * so the plan downstream of the rewrite is IDENTICAL to the
 * DataFrame-API path (one partial/final agg shuffle on the window
 * columns; streams compose unchanged because the fan-out is stateless).
 *
 * Documented subset (all failures are loud, never silent pass-through):
 * positional arguments only (no `DATA =>` named-argument form), literal
 * `INTERVAL 'n' UNIT` durations, and CUMULATE/HOP steps that divide
 * evenly. Any TVF occurrence the rewriter cannot desugar leaves a
 * `DESCRIPTOR(` in the text, which `sql()` rejects before parsing.
 */
object WindowTvfSql {

  // [TABLE(] TUMBLE|HOP|CUMULATE (TABLE t, DESCRIPTOR(ts), <args>) [)]
  private val Tvf =
    """(?is)(TABLE\s*\(\s*)?\b(TUMBLE|HOP|CUMULATE)\s*\(\s*TABLE\s+([A-Za-z_][A-Za-z0-9_]*)\s*,\s*DESCRIPTOR\s*\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*\)\s*,([^)]*)\)\s*""".r

  private[sqlx] val IntervalLit =
    """(?is)INTERVAL\s+'(\d+)'\s+(SECOND|MINUTE|HOUR|DAY)S?""".r

  private[sqlx] val unitSecs =
    Map("SECOND" -> 1L, "MINUTE" -> 60L, "HOUR" -> 3600L, "DAY" -> 86400L)

  /** Parse the TVF's trailing `INTERVAL 'n' UNIT` arguments → seconds.
   * The tail must consist of NOTHING but interval literals and commas —
   * named arguments (`SIZE => ...`) or expression offsets would
   * otherwise be discarded silently, changing query semantics. */
  private[sqlx] def intervals(args: String, fn: String): List[Long] = {
    val found = IntervalLit.findAllMatchIn(args)
      .map(m => m.group(1).toLong * unitSecs(m.group(2).toUpperCase)).toList
    require(found.nonEmpty, s"$fn: expected INTERVAL 'n' UNIT arguments, got: $args")
    val leftover = IntervalLit.replaceAllIn(args, "").replace(",", "").trim
    require(leftover.isEmpty,
      s"$fn: unsupported argument text '$leftover' (positional INTERVAL " +
      s"'n' UNIT literals only), in: $args")
    found
  }

  private def dur(secs: Long): String = s"'$secs seconds'"

  /** Rewrite every window-TVF call in `query` (pure text-to-text). */
  def desugar(query: String): String = {
    var out = query
    var m = Tvf.findAllMatchIn(out).find(mm => !SqlLexer.inQuote(out, mm.start))
    while (m.isDefined) {
      val mm = m.get
      val (fn, table, ts, args) =
        (mm.group(2).toUpperCase, mm.group(3), mm.group(4), mm.group(5))
      val iv = intervals(args, fn)
      val inner = fn match {
        case "TUMBLE" =>
          require(iv.size <= 2, s"TUMBLE takes (size[, offset]), got: $args")
          val size = dur(iv.head)
          val win =
            if (iv.size == 2) s"window($ts, $size, $size, ${dur(iv(1))})"
            else s"window($ts, $size)"
          s"""(SELECT * EXCEPT (__w), __w.start AS window_start, __w.end AS window_end
             | FROM (SELECT *, $win AS __w FROM $table) __tvf)""".stripMargin
        case "HOP" =>
          require(iv.size == 2, s"HOP takes (slide, size), got: $args")
          val (slide, size) = (iv.head, iv(1)) // reference order: slide first
          s"""(SELECT * EXCEPT (__w), __w.start AS window_start, __w.end AS window_end
             | FROM (SELECT *, window($ts, ${dur(size)}, ${dur(slide)}) AS __w FROM $table) __tvf)""".stripMargin
        case "CUMULATE" =>
          require(iv.size == 2, s"CUMULATE takes (step, size), got: $args")
          val (step, size) = (iv.head, iv(1))
          require(step > 0 && size % step == 0,
            s"CUMULATE step must divide size, got step=${step}s size=${size}s")
          val wEnd = s"__w.start + make_interval(0, 0, 0, 0, 0, 0, __k * $step)"
          s"""(SELECT * EXCEPT (__w, __k), __w.start AS window_start, $wEnd AS window_end
             | FROM (SELECT *, window($ts, ${dur(size)}) AS __w,
             |              explode(sequence(1, ${size / step})) AS __k FROM $table) __tvf
             | WHERE $wEnd > $ts)""".stripMargin
      }
      // the optional TABLE( wrapper swallows its closing paren — only
      // whitespace may sit between the TVF and that close, anything
      // else would be deleted silently
      val end =
        if (mm.group(1) != null) {
          val close = out.indexOf(')', mm.end)
          require(close >= 0, s"unclosed TABLE( around $fn")
          require(out.substring(mm.end, close).isBlank,
            s"unexpected text '${out.substring(mm.end, close).trim}' " +
            s"between $fn(...) and the TABLE( close")
          close + 1
        } else mm.end
      out = out.substring(0, mm.start) + inner + " " + out.substring(end)
      m = Tvf.findAllMatchIn(out).find(x => !SqlLexer.inQuote(out, x.start))
    }
    out
  }

  /** Desugar + run. Rejects any TVF the rewriter could not handle
   * (quote-aware: a DESCRIPTOR( inside a string literal is fine). */
  def sql(spark: SparkSession, query: String): DataFrame = {
    val q = desugar(query)
    val undesugared = """(?i)DESCRIPTOR\s*\(""".r.findAllMatchIn(q)
      .exists(m => !SqlLexer.inQuote(q, m.start))
    require(!undesugared,
      s"window TVF not desugared (unsupported form — positional args and " +
      s"literal intervals only):\n$q")
    spark.sql(q)
  }
}
