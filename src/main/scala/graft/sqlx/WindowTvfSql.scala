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
 * Both argument forms of the reference are accepted
 * (`FlinkSqlOperatorTable.java:1178-1181`): positional
 * `(TABLE t, DESCRIPTOR(ts), INTERVAL ...)` and named
 * `(DATA => TABLE t, TIMECOL => DESCRIPTOR(ts), SIZE => ...)` — named
 * args may appear in any order and normalize to the positional form
 * before the rewrite, so both produce hash-identical plans. Durations
 * are literal `INTERVAL 'n' UNIT`, or (through [[sql]], which has a
 * session to evaluate with) any constant interval expression — the
 * argument list is lexer-matched on balanced parens, so
 * `make_interval(…)` and parenthesized arithmetic survive.
 *
 * Documented subset (all failures are loud, never silent pass-through):
 * whole-second resolution, and CUMULATE steps that divide evenly. Any TVF occurrence the
 * rewriter cannot desugar leaves a `DESCRIPTOR(` in the text, which
 * `sql()` rejects before parsing.
 */
object WindowTvfSql {

  private[sqlx] val IntervalLit =
    """(?is)INTERVAL\s+'(\d+)'\s+(SECOND|MINUTE|HOUR|DAY)S?""".r

  private[sqlx] val unitSecs =
    Map("SECOND" -> 1L, "MINUTE" -> 60L, "HOUR" -> 3600L, "DAY" -> 86400L)

  /** Parse the TVF's trailing duration arguments → seconds. Fast path:
   * nothing but `INTERVAL 'n' UNIT` literals and commas. Fallback:
   * with an evaluator available (the [[sql]] entry), each top-level
   * comma-split argument evaluates as a constant interval expression.
   * Anything else fails loudly — silent discard would change query
   * semantics. */
  private[sqlx] def intervals(args: String, fn: String,
      evalSecs: Option[String => Long] = None): List[Long] = {
    val found = IntervalLit.findAllMatchIn(args)
      .map(m => m.group(1).toLong * unitSecs(m.group(2).toUpperCase)).toList
    val leftover = IntervalLit.replaceAllIn(args, "").replace(",", "").trim
    if (found.nonEmpty && leftover.isEmpty) found
    else evalSecs match {
      case Some(ev) =>
        val parts = SqlLexer.splitTop(args).map(_.trim).filter(_.nonEmpty)
        require(parts.nonEmpty, s"$fn: expected duration arguments, got: $args")
        parts.map(ev).toList
      case None =>
        require(found.nonEmpty,
          s"$fn: expected INTERVAL 'n' UNIT arguments, got: $args")
        require(leftover.isEmpty,
          s"$fn: unsupported argument text '$leftover' (INTERVAL 'n' UNIT " +
          s"literals only in this entry; expressions need the sql() door), in: $args")
        found
    }
  }

  // FN( whose argument list contains a named argument (=>): normalized
  // to the positional form before the main rewrite
  private val FnOpen = """(?is)\b(TUMBLE|HOP|CUMULATE)\s*\(""".r

  /** Rewrite ONE named-argument TVF call to positional form; None when
   * no named-argument call remains. Named args may appear in any order
   * (reference SqlWindowTableFunction named parameters). */
  private def namedToPositional(out: String): Option[String] = {
    FnOpen.findAllMatchIn(out)
      .filter(m => !SqlLexer.inQuote(out, m.start))
      .flatMap { mm =>
        val open = mm.end - 1
        val close = SqlLexer.closeOf(out, open)
        if (close < 0) None else Some((mm, close, out.substring(open + 1, close)))
      }
      .find { case (_, _, body) =>
        SqlLexer.splitTop(body).exists(_.contains("=>")) }
      .map { case (mm, close, body) =>
        val fn = mm.group(1).toUpperCase
        val parts = SqlLexer.splitTop(body).map(_.trim)
        val named = parts.map { a =>
          val i = a.indexOf("=>")
          require(i > 0,
            s"$fn: mixed positional and named arguments are unsupported: '$a'")
          (a.take(i).trim.toUpperCase, a.drop(i + 2).trim)
        }
        require(named.map(_._1).distinct.size == named.size,
          s"$fn: duplicate named argument in: $body")
        val byName = named.toMap
        val data = byName.getOrElse("DATA",
          sys.error(s"$fn: named form requires DATA => TABLE t"))
        require(data.toUpperCase.startsWith("TABLE"),
          s"$fn: DATA must be 'TABLE t', got: $data")
        val timecol = byName.getOrElse("TIMECOL",
          sys.error(s"$fn: named form requires TIMECOL => DESCRIPTOR(col)"))
        require(timecol.toUpperCase.startsWith("DESCRIPTOR"),
          s"$fn: TIMECOL must be DESCRIPTOR(col), got: $timecol")
        val durKeys = fn match {
          case "TUMBLE" => Seq("SIZE") ++
            (if (byName.contains("OFFSET")) Seq("OFFSET") else Nil)
          case "HOP" => Seq("SLIDE", "SIZE") ++
            (if (byName.contains("OFFSET")) Seq("OFFSET") else Nil)
          case _ => Seq("STEP", "SIZE")
        }
        val extras = byName.keySet -- durKeys.toSet -- Set("DATA", "TIMECOL")
        require(extras.isEmpty, s"$fn: unsupported named arguments $extras")
        durKeys.foreach(k => require(byName.contains(k),
          s"$fn: named form requires $k => <interval>"))
        val repl = s"$fn($data, $timecol, ${durKeys.map(byName).mkString(", ")})"
        out.substring(0, mm.start) + repl + out.substring(close + 1)
      }
  }

  private def dur(secs: Long): String = s"'$secs seconds'"

  private val TableArg = """(?is)TABLE\s+([A-Za-z_][A-Za-z0-9_]*)""".r
  private val DescriptorArg =
    """(?is)DESCRIPTOR\s*\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*\)""".r

  /** Locate the next positional TVF call via the lexer: the argument
   * list is the paren-BALANCED span (so parenthesized duration
   * expressions like `make_interval(…)` survive, which a to-first-close
   * regex could not), split on top-level commas. Returns
   * (fnStart, fn, close, table, tsCol, durationParts). */
  private def findPositional(out: String)
      : Option[(Int, String, Int, String, String, Seq[String])] =
    FnOpen.findAllMatchIn(out)
      .filter(m => !SqlLexer.inQuote(out, m.start))
      .flatMap { mm =>
        val close = SqlLexer.closeOf(out, mm.end - 1)
        if (close < 0) None
        else {
          val parts = SqlLexer.splitTop(out.substring(mm.end, close))
          (parts.headOption, parts.drop(1).headOption) match {
            case (Some(TableArg(table)), Some(DescriptorArg(ts))) =>
              Some((mm.start, mm.group(1).toUpperCase, close, table, ts,
                parts.drop(2)))
            case _ => None
          }
        }
      }.nextOption()

  /** Rewrite every window-TVF call in `query` (pure text-to-text). */
  def desugar(query: String, evalSecs: Option[String => Long] = None): String = {
    var out = query
    var named = namedToPositional(out)
    while (named.isDefined) { out = named.get; named = namedToPositional(out) }
    var m = findPositional(out)
    while (m.isDefined) {
      val (fnStart, fn, close, table, ts, durParts) = m.get
      val args = durParts.mkString(", ")
      val iv = intervals(args, fn, evalSecs)
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
          require(iv.size == 2 || iv.size == 3,
            s"HOP takes (slide, size[, offset]), got: $args")
          val (slide, size) = (iv.head, iv(1)) // reference order: slide first
          val win =
            if (iv.size == 3) s"window($ts, ${dur(size)}, ${dur(slide)}, ${dur(iv(2))})"
            else s"window($ts, ${dur(size)}, ${dur(slide)})"
          s"""(SELECT * EXCEPT (__w), __w.start AS window_start, __w.end AS window_end
             | FROM (SELECT *, $win AS __w FROM $table) __tvf)""".stripMargin
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
      val (start, end) = {
        var i = fnStart - 1
        while (i >= 0 && out.charAt(i).isWhitespace) i -= 1
        val wrapOpen =
          if (i >= 0 && out.charAt(i) == '(') {
            var j = i - 1
            while (j >= 0 && out.charAt(j).isWhitespace) j -= 1
            val w = j - 4 // "TABLE" spans w..j
            if (w >= 0 && out.substring(w, j + 1).equalsIgnoreCase("TABLE") &&
                (w == 0 || { val c = out.charAt(w - 1)
                  !c.isLetterOrDigit && c != '_' })) Some(w) else None
          } else None
        wrapOpen match {
          case Some(w) =>
            var k = close + 1
            while (k < out.length && out.charAt(k).isWhitespace) k += 1
            require(k < out.length && out.charAt(k) == ')',
              s"unexpected text between $fn(...) and the TABLE( close")
            (w, k + 1)
          case None => (fnStart, close + 1)
        }
      }
      out = out.substring(0, start) + inner + " " + out.substring(end)
      m = findPositional(out)
    }
    out
  }

  /** Desugar + run. Rejects any TVF the rewriter could not handle
   * (quote-aware: a DESCRIPTOR( inside a string literal is fine). */
  def sql(spark: SparkSession, query: String): DataFrame = {
    // constant-expression durations evaluate through the session
    // (whole seconds only; months have no fixed length and are rejected)
    val evalSecs: String => Long = { e =>
      val v = spark.sql(s"SELECT ($e)").first().get(0)
      v match {
        case d: java.time.Duration =>
          require(d.getNano == 0, s"sub-second interval unsupported: $e")
          d.getSeconds
        case ci: org.apache.spark.unsafe.types.CalendarInterval =>
          require(ci.months == 0, s"month-based interval unsupported: $e")
          require(ci.microseconds % 1000000L == 0,
            s"sub-second interval unsupported: $e")
          ci.days * 86400L + ci.microseconds / 1000000L
        case other => sys.error(
          s"window TVF duration must be a constant interval, got '$other' for: $e")
      }
    }
    val q = desugar(query, Some(evalSecs))
    val undesugared = """(?i)DESCRIPTOR\s*\(""".r.findAllMatchIn(q)
      .exists(m => !SqlLexer.inQuote(q, m.start))
    require(!undesugared,
      s"window TVF not desugared (unsupported form):\n$q")
    spark.sql(q)
  }
}
