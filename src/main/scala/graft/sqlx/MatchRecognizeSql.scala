package graft.sqlx

import org.apache.spark.sql.SparkSession

/**
 * MATCH_RECOGNIZE as plain query text through the unified SQL door —
 * the reference accepts `SELECT ... FROM t MATCH_RECOGNIZE (...)` via
 * `TableEnvironment.executeSql` and plans the clause as
 * `StreamExecMatch` (`flink-table-planner/.../nodes/exec/stream/StreamExecMatch.java:90`).
 * Spark's parser has no MATCH_RECOGNIZE, so — same recipe as
 * [[TemporalSql.desugar]] and [[WindowTvfSql.desugar]] — each
 * `<table> MATCH_RECOGNIZE (<spec>)` span is executed through
 * [[MatchRecognize.run]] (the CEP-engine compiler), its result
 * registered as a temp view, and the span replaced by the view name so
 * the surrounding query (outer projections, WHERE, aggregation, joins,
 * set ops) parses as ordinary SQL. Any trailing `[AS] alias` after the
 * closing paren is left in place — it aliases the spliced view.
 *
 * The engine needs a unique Long id per row for deterministic ordering
 * ties and match dedup (the programmatic entry points take it as
 * `idCol`). In query text it comes from the spec itself: an
 * `ORDER BY ts, event_id` second sort key names it (SQL:2016 requires
 * the sort to be deterministic anyway); absent that, a column named
 * `event_id` or `id` on the input table is used; absent both, the
 * rewrite fails loudly.
 *
 * Documented subset: the MATCH_RECOGNIZE input must be a named
 * table/view, not a subquery — register the subquery as a view first
 * (the reference's planner accepts either; this front-end is a
 * text-to-text rewriter, SURVEY §7.1).
 */
object MatchRecognizeSql {

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"MATCH_RECOGNIZE SQL: $msg")

  /** Rewrite every `<table> MATCH_RECOGNIZE (<spec>)` span in `query`
   * into a temp view over the engine's output, returning the rewritten
   * text (which no longer contains the keyword). */
  def desugar(spark: SparkSession, query: String,
      watermarkDelay: String = "1 hour"): String = {
    var out = query
    var n = 0
    var hit = SqlLexer.findKeyword(out, "MATCH_RECOGNIZE")
    while (hit.isDefined) {
      val (kwStart, kwEnd) = hit.get
      // the input: the table/view identifier immediately before the keyword
      var tEnd = kwStart
      while (tEnd > 0 && out.charAt(tEnd - 1).isWhitespace) tEnd -= 1
      var tStart = tEnd
      while (tStart > 0 && { val c = out.charAt(tStart - 1)
        c.isLetterOrDigit || c == '_' || c == '.' }) tStart -= 1
      val table = out.substring(tStart, tEnd)
      if (!table.matches("""[A-Za-z_][A-Za-z0-9_.]*"""))
        fail("input must be a named table/view (FROM t MATCH_RECOGNIZE (...)); " +
          "register subqueries as a view first")
      var open = kwEnd
      while (open < out.length && out.charAt(open).isWhitespace) open += 1
      if (open >= out.length || out.charAt(open) != '(')
        fail("expected '(' after MATCH_RECOGNIZE")
      val close = SqlLexer.closeOf(out, open)
      if (close < 0) fail("unbalanced parens in MATCH_RECOGNIZE spec")
      val block = out.substring(kwStart, close + 1)
      val df = spark.table(table)
      // fallback id column when the spec's ORDER BY has no tiebreaker;
      // MatchRecognize.run prefers the in-text tiebreaker when present
      val idGuess = Seq("event_id", "id").find(df.columns.contains).getOrElse("")
      val res = MatchRecognize.run(df, block, idGuess, watermarkDelay)
      n += 1
      val view = s"graft_mr_${Integer.toHexString((table + block).hashCode)}_$n"
      res.createOrReplaceTempView(view)
      out = out.substring(0, tStart) + view + out.substring(close + 1)
      hit = SqlLexer.findKeyword(out, "MATCH_RECOGNIZE")
    }
    out
  }
}
