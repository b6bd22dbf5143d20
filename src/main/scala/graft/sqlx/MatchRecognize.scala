package graft.sqlx

import graft.streaming.{Cep, Ev}
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * MATCH_RECOGNIZE SQL surface over the CEP engine — the reference's
 * `nodes/exec/stream/StreamExecMatch.java:90` +
 * `match/PatternTranslator`-style clause handling, re-expressed as a
 * parser that compiles onto `Cep.Pattern` and projects MEASURES with
 * Spark column expressions over the match's step bindings.
 *
 * Supported subset (documented; everything else raises):
 *  - PARTITION BY user_id        (the CEP engine keys by user_id)
 *  - ORDER BY ts                 (event-time order, ties by event_id)
 *  - MEASURES `[FIRST|LAST](Sym.field)` AS alias, ... — default is
 *    LAST per SQL FINAL semantics; fields are the events columns
 *  - ONE ROW PER MATCH | ALL ROWS PER MATCH (FINAL measure semantics;
 *    ALL ROWS adds CLASSIFIER and the row's event columns)
 *  - AFTER MATCH SKIP TO NEXT ROW | SKIP PAST LAST ROW |
 *    SKIP TO [FIRST|LAST] Sym    (default NO_SKIP, as the reference)
 *  - PATTERN (A B+ C? D{1,3} ...) with quantifiers +, ?, +?, ??, {m,n} on
 *    non-initial symbols; contiguity is strict, per MATCH_RECOGNIZE
 *  - WITHIN INTERVAL 'n' unit
 *  - DEFINE Sym AS Sym.field op literal [AND ...] — conjunctions of
 *    comparisons on the current row; undefined symbols match any row
 *
 * Scale: parsing is driver-side trivia; execution is `Cep.runBound`
 * (keyed state, watermark-evicted buffer) and a columnar projection —
 * nothing new materializes.
 */
object MatchRecognize {

  final case class Measure(fn: Option[String], sym: String, field: String, alias: String)
  final case class Spec(partitionBy: String, orderBy: String, measures: Seq[Measure],
      skip: Cep.AfterMatch, pattern: Cep.Pattern[Ev], allRows: Boolean = false)

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"MATCH_RECOGNIZE: $msg")

  /** Extract the balanced-paren body of the MATCH_RECOGNIZE clause. */
  private def body(sql: String): String = {
    val up = sql.toUpperCase
    val kw = up.indexOf("MATCH_RECOGNIZE")
    if (kw < 0) fail("no MATCH_RECOGNIZE clause")
    val open = sql.indexOf('(', kw)
    var depth = 0
    var i = open
    while (i < sql.length) {
      sql(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) return sql.substring(open + 1, i)
        case _ => ()
      }
      i += 1
    }
    fail("unbalanced parens")
  }

  /** Slice the body into its ordered sections. Markers match only as
   * whole words (so an alias like `pattern_total` cannot hit `PATTERN`)
   * and only outside single-quoted literals (so a DEFINE literal
   * 'WITHIN' cannot mis-slice the spec). */
  private def sections(b: String): Map[String, String] = {
    // spans of '...' literals — marker hits inside them are ignored
    val quoted = {
      val spans = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      var i = 0; var start = -1
      while (i < b.length) {
        if (b(i) == '\'') { if (start < 0) start = i else { spans += ((start, i)); start = -1 } }
        i += 1
      }
      spans.toList
    }
    def inQuote(i: Int) = quoted.exists { case (s, e) => i > s && i < e }
    val markers = Seq(
      "PARTITION BY" -> """(?i)\bPARTITION\s+BY\b""",
      "ORDER BY" -> """(?i)\bORDER\s+BY\b""",
      "MEASURES" -> """(?i)\bMEASURES\b""",
      "ONE ROW PER MATCH" -> """(?i)\bONE\s+ROW\s+PER\s+MATCH\b""",
      "ALL ROWS PER MATCH" -> """(?i)\bALL\s+ROWS\s+PER\s+MATCH\b""",
      "AFTER MATCH" -> """(?i)\bAFTER\s+MATCH\b""",
      "PATTERN" -> """(?i)\bPATTERN\b""",
      "WITHIN" -> """(?i)\bWITHIN\b""",
      "DEFINE" -> """(?i)\bDEFINE\b""")
    val hits = markers.flatMap { case (m, re) =>
      re.r.findAllMatchIn(b).find(h => !inQuote(h.start)).map(h => (m, h.start, h.end))
    }.sortBy(_._2)
    hits.zipWithIndex.map { case ((m, i, e), k) =>
      val end = if (k + 1 < hits.size) hits(k + 1)._2 else b.length
      m -> b.substring(e, end).trim.stripSuffix(",").trim
    }.toMap
  }

  private val MeasureRe =
    """(?i)(?:(FIRST|LAST)\s*\(\s*)?(\w+)\.(\w+)\s*\)?\s+AS\s+(\w+)""".r
  private val CmpRe = """(?i)(\w+)\.(\w+)\s*(=|<>|<=|>=|<|>)\s*(.+)""".r
  private val IntervalRe = """(?i)INTERVAL\s+'(\d+)'\s+(SECOND|MINUTE|HOUR|DAY)S?""".r

  private def parseDefine(sym: String, cond: String): Ev => Boolean = {
    val conjs = cond.split("(?i)\\s+AND\\s+").map(_.trim).map {
      case CmpRe(s, field, op, lit0) =>
        if (!s.equalsIgnoreCase(sym))
          fail(s"DEFINE $sym references other symbol $s (subset: current row only)")
        val lit = lit0.trim
        if (field.equalsIgnoreCase("event_type")) {
          val s0 = lit.stripPrefix("'").stripSuffix("'")
          op match {
            case "=" => (e: Ev) => e.event_type == s0
            case "<>" => (e: Ev) => e.event_type != s0
            case o => fail(s"op $o not valid for event_type")
          }
        } else {
          val num = lit.toDouble
          val get: Ev => Double = field.toLowerCase match {
            case "value" => _.value
            case "event_id" => _.event_id.toDouble
            case "user_id" => _.user_id.toDouble
            case "ts_us" => _.ts_us.toDouble
            case f => fail(s"unknown field $f")
          }
          op match {
            case "=" => (e: Ev) => get(e) == num
            case "<>" => (e: Ev) => get(e) != num
            case "<" => (e: Ev) => get(e) < num
            case "<=" => (e: Ev) => get(e) <= num
            case ">" => (e: Ev) => get(e) > num
            case ">=" => (e: Ev) => get(e) >= num
          }
        }
      case c => fail(s"cannot parse DEFINE condition '$c'")
    }
    e => conjs.forall(_(e))
  }

  def parse(sql: String): Spec = {
    val sec = sections(body(sql))
    val part = sec.getOrElse("PARTITION BY", fail("PARTITION BY required")).trim
    if (part != "user_id") fail(s"subset: PARTITION BY user_id only, got $part")
    val ord = sec.getOrElse("ORDER BY", fail("ORDER BY required")).trim
    if (ord != "ts" && ord != "ts_us") fail(s"subset: ORDER BY ts only, got $ord")

    val defines: Map[String, Ev => Boolean] =
      sec.get("DEFINE").map { d =>
        d.split(",(?![^()]*\\))").map(_.trim).filter(_.nonEmpty).map { entry =>
          val m = """(?is)(\w+)\s+AS\s+(.+)""".r
          entry match {
            case m(sym, cond) => sym.toUpperCase -> parseDefine(sym, cond)
            case _ => fail(s"cannot parse DEFINE entry '$entry'")
          }
        }.toMap
      }.getOrElse(Map.empty)

    val patternTxt = sec.getOrElse("PATTERN", fail("PATTERN required"))
      .trim.stripPrefix("(").stripSuffix(")").trim
    val RangeQuant = """^([A-Za-z_][A-Za-z0-9_]*)\{(\d+),(\d+)\}$""".r
    val BareSym = """^[A-Za-z_][A-Za-z0-9_]*$""".r
    val tokens = patternTxt.split("\\s+").toSeq.map {
      case RangeQuant(sym, lo, hi) => (sym.toUpperCase, s"{${lo.toInt},${hi.toInt}}")
      case t =>
        val quant = Seq("+?", "??", "+", "?").find(q => t.endsWith(q)).getOrElse("")
        val sym = t.stripSuffix(quant)
        // reject unsupported quantifier spellings ({m}, {m,}, *) loudly
        // rather than treating them as a never-defined symbol name
        if (!BareSym.matches(sym)) fail(s"unsupported pattern token '$t'")
        (sym.toUpperCase, quant)
    }
    if (tokens.isEmpty) fail("empty PATTERN")
    if (tokens.head._2.nonEmpty)
      fail("subset: first pattern symbol must be unquantified")
    def pred(sym: String): Ev => Boolean = defines.getOrElse(sym, _ => true)
    val Range = """\{(\d+),(\d+)\}""".r
    var pat = Cep.Pattern.begin(tokens.head._1, pred(tokens.head._1))
    tokens.tail.foreach { case (sym, q) =>
      pat = q match {
        case "" => pat.next(sym, pred(sym))
        case "+" => pat.oneOrMoreNext(sym, pred(sym))
        case "+?" => pat.oneOrMoreNextReluctant(sym, pred(sym))
        case "?" => pat.optionalNext(sym, pred(sym))
        case "??" => pat.optionalReluctant(sym, pred(sym))
        case Range(lo, hi) =>
          // SQL {m,n}: m required + (n-m) optional, strict contiguity
          val (m, n) = (lo.toInt, hi.toInt)
          if (m < 1 || n < m) fail(s"bad range quantifier {$lo,$hi}")
          var p = pat
          (1 to m).foreach(i => p = p.next(s"$sym#$i", pred(sym)))
          (m + 1 to n).foreach(i => p = p.optionalNext(s"$sym#$i", pred(sym)))
          p
      }
    }
    sec.get("WITHIN").foreach {
      case IntervalRe(n, unit) =>
        val us = unit.toUpperCase match {
          case "SECOND" => n.toLong * 1000000L
          case "MINUTE" => n.toLong * 60000000L
          case "HOUR" => n.toLong * 3600000000L
          case "DAY" => n.toLong * 86400000000L
        }
        pat = pat.within(us)
      case w => fail(s"cannot parse WITHIN '$w'")
    }
    val skip = sec.get("AFTER MATCH").map(_.trim.toUpperCase).map {
      case "SKIP TO NEXT ROW" => Cep.SkipToNext
      case "SKIP PAST LAST ROW" => Cep.SkipPastLast
      case s if s.startsWith("SKIP TO FIRST") =>
        Cep.SkipToFirst(s.stripPrefix("SKIP TO FIRST").trim)
      case s if s.startsWith("SKIP TO LAST") =>
        Cep.SkipToLast(s.stripPrefix("SKIP TO LAST").trim)
      case s => fail(s"cannot parse AFTER MATCH '$s'")
    }.getOrElse(Cep.NoSkip)
    pat = pat.afterMatchSkip(skip)

    val measures = sec.getOrElse("MEASURES", fail("MEASURES required"))
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq.map {
        case MeasureRe(fn, sym, field, alias) =>
          Measure(Option(fn).map(_.toUpperCase), sym.toUpperCase, field, alias)
        case m => fail(s"cannot parse measure '$m'")
      }
    Spec(part, ord, measures, skip, pat, allRows = sec.contains("ALL ROWS PER MATCH"))
  }

  /** Execute a MATCH_RECOGNIZE query over the events stream. ONE ROW
   * PER MATCH: partition key + measures. ALL ROWS PER MATCH: one row
   * per matched event — partition key, CLASSIFIER (the step's symbol,
   * range expansions collapsed), the event's id/ts/value, then the
   * measures with SQL FINAL semantics (constant across the match). */
  def run(events: Dataset[Ev], sql: String,
      watermarkDelay: String = "1 hour"): DataFrame = {
    val spec = parse(sql)
    val bound = Cep.runBound(events, spec.pattern, watermarkDelay).toDF()
    val cols: Seq[Column] = spec.measures.map { m =>
      // range-quantified symbols expand to SYM#k step names
      val arr = filter(col("binds"), b =>
        b.getField("step") === m.sym || b.getField("step").startsWith(m.sym + "#"))
      val pick = m.fn match {
        case Some("FIRST") => element_at(arr, 1)
        case _ => element_at(arr, -1) // LAST / SQL FINAL default
      }
      pick.getField("ev").getField(m.field).as(m.alias)
    }
    if (!spec.allRows)
      bound.select(col("user_id") +: cols: _*)
    else
      bound.select(col("user_id") +: col("binds") +: cols.map(c => c): _*)
        .select(col("user_id") +: explode(col("binds")).as("__b") +:
          spec.measures.map(m => col(m.alias)): _*)
        .select(Seq(col("user_id"),
          expr("split(__b.step, '#')[0]").as("classifier"),
          col("__b.ev.event_id").as("event_id"),
          col("__b.ev.ts_us").as("ts_us"),
          col("__b.ev.value").as("value")) ++
          spec.measures.map(m => col(m.alias)): _*)
  }
}
