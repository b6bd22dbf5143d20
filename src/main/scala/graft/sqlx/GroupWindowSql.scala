package graft.sqlx

/**
 * Legacy group-window SQL syntax — the reference's pre-TVF window
 * surface, still primary in its docs and tests:
 * `GROUP BY TUMBLE(ts, INTERVAL '15' MINUTE)` with
 * `TUMBLE_START/TUMBLE_END` auxiliary projections (and HOP/SESSION
 * likewise; `flink-table-planner/.../functions/sql/FlinkSqlOperatorTable.java`
 * TUMBLE_OLD/HOP_OLD/SESSION_OLD + the `*_START`/`*_END` auxiliary
 * group functions). Spark groups on `window()` / `session_window()`
 * and projects the struct's `start`/`end`, so the rewrite is
 * text-to-text, same recipe as [[WindowTvfSql]]:
 *
 * {{{
 * SELECT TUMBLE_START(ts, INTERVAL '15' MINUTE), count(*)
 * FROM events GROUP BY TUMBLE(ts, INTERVAL '15' MINUTE)
 *   -->
 * SELECT window.start, count(*)
 * FROM events GROUP BY window(ts, '900 seconds')
 * }}}
 *
 * Argument order follows the reference: `TUMBLE(time, size)`,
 * `HOP(time, slide, size)` (slide FIRST — Spark's `window(col, size,
 * slide)` order is swapped by the rewrite), `SESSION(time, gap)`.
 *
 * Documented subset (loud failures, never silent pass-through): one
 * distinct group window per query (as the reference), literal
 * `INTERVAL 'n' UNIT` durations, a bare column as the time attribute,
 * and `*_START`/`*_END` argument lists textually matching the GROUP BY
 * window's. TVF-form calls (`TUMBLE(TABLE t, DESCRIPTOR(...))`) are
 * left untouched for [[WindowTvfSql]]. The rewrite projects the
 * grouped struct by its generated name (`window` / `session_window`);
 * a source table with a same-named column makes the reference
 * ambiguous — Spark raises its ambiguity error rather than silently
 * resolving, so rename such a column before using the legacy syntax.
 */
object GroupWindowSql {

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"group window SQL: $msg")

  private val Head = """(?i)\b(TUMBLE|HOP|SESSION)(_START|_END)?\s*\(""".r

  private final case class Call(fn: String, suffix: String,
      start: Int, end: Int, args: Seq[String]) {
    def canonicalArgs: String = args.map(_.replaceAll("\\s+", " ").trim.toUpperCase).mkString(",")
  }

  private def calls(q: String): Seq[Call] =
    Head.findAllMatchIn(q).filter(m => !SqlLexer.inQuote(q, m.start))
      .filter(m => m.start == 0 || { val c = q.charAt(m.start - 1)
        !(c.isLetterOrDigit || c == '_') })
      .map { m =>
        val open = q.indexOf('(', m.start + m.group(1).length)
        val close = SqlLexer.closeOf(q, open)
        if (close < 0) fail("unbalanced parens")
        Call(m.group(1).toUpperCase,
          Option(m.group(2)).getOrElse("").toUpperCase,
          m.start, close + 1,
          SqlLexer.splitTop(q.substring(open + 1, close)))
      }.toSeq
      // TVF form (TABLE t, DESCRIPTOR(ts), ...) belongs to WindowTvfSql
      .filterNot(c => c.args.headOption.exists(_.matches("(?is)TABLE\\s+.*")))

  /** Rewrite the legacy group-window calls in `query` (text-to-text). */
  def desugar(query: String): String = {
    val found = calls(query)
    if (found.isEmpty) return query
    val groups = found.filter(_.suffix.isEmpty)
    if (groups.isEmpty)
      fail("TUMBLE_START/_END etc. require the matching window in GROUP BY")
    val distinctGroups = groups.map(c => (c.fn, c.canonicalArgs)).distinct
    if (distinctGroups.size > 1)
      fail(s"one group window per query (as the reference), got: " +
        distinctGroups.map(_._1).mkString(", "))
    val (fn, canon) = distinctGroups.head
    val timeCol = groups.head.args.headOption.getOrElse(fail(s"$fn needs a time column"))
    if (!timeCol.matches("""[A-Za-z_]\w*"""))
      fail(s"$fn time attribute must be a bare column, got '$timeCol'")
    val iv = WindowTvfSql.intervals(groups.head.args.drop(1).mkString(","), fn)
    val (grouped, struct) = fn match {
      case "TUMBLE" =>
        if (iv.size != 1) fail(s"TUMBLE(time, size), got ${iv.size + 1} args")
        (s"window($timeCol, '${iv.head} seconds')", "window")
      case "HOP" =>
        // reference order (time, slide, size); Spark window(col, size, slide)
        if (iv.size != 2) fail(s"HOP(time, slide, size), got ${iv.size + 1} args")
        (s"window($timeCol, '${iv(1)} seconds', '${iv.head} seconds')", "window")
      case "SESSION" =>
        if (iv.size != 1) fail(s"SESSION(time, gap), got ${iv.size + 1} args")
        (s"session_window($timeCol, '${iv.head} seconds')", "session_window")
    }
    // rewrite back-to-front so spans stay valid
    found.sortBy(-_.start).foldLeft(query) { (q, c) =>
      if (c.fn != fn || c.canonicalArgs != canon)
        fail(s"${c.fn}${c.suffix} arguments must match the GROUP BY window " +
          s"(${fn}($canon)), got (${c.canonicalArgs})")
      val repl = c.suffix match {
        case "" => grouped
        case "_START" => s"$struct.start"
        case "_END" => s"$struct.end"
      }
      q.substring(0, c.start) + repl + q.substring(c.end)
    }
  }
}
