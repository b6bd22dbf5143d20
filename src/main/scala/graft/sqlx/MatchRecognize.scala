package graft.sqlx

import graft.streaming.{Cep, Ev}
import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Dynamic event row for the schema-generic MATCH_RECOGNIZE surface:
 * any input schema maps onto (partition key, event-time micros, unique
 * id, integral fields, fractional fields, string fields) — three flat
 * ARRAYS addressed by a driver-compiled [[MrLayout]], the
 * field-getter recipe of the stateful layer (`StatefulOps.scala:50`).
 * The reference code-generates typed accessors per query
 * (`MatchCodeGenerator.scala:61`); arrays + precompiled indices are
 * the closure-world equivalent — no per-row map allocation, no boxing
 * of the whole row, and integral fields keep 64-bit precision through
 * DEFINE comparisons (a `Map[String, Double]` would corrupt ids above
 * 2^53).
 */
case class MrEv(key: String, ts_us: Long, id: Long,
    longs: Array[Long], nums: Array[Double], strs: Array[String])

/** Field-name → (array, index) layout compiled ONCE per query from the
 * input schema (driver-side), captured by the DEFINE/MEASURES
 * closures. */
final case class MrLayout(longFields: Seq[String], numFields: Seq[String],
    strFields: Seq[String]) {
  /** 'l' = longs, 'd' = nums, 's' = strs. */
  val kind: Map[String, (Char, Int)] =
    longFields.zipWithIndex.map { case (f, i) => f -> (('l', i)) }.toMap ++
      numFields.zipWithIndex.map { case (f, i) => f -> (('d', i)) }.toMap ++
      strFields.zipWithIndex.map { case (f, i) => f -> (('s', i)) }.toMap
}

object MrLayout {
  private val integralTypes: Set[DataType] =
    Set(ByteType, ShortType, IntegerType, LongType)

  def of(schema: StructType): MrLayout = MrLayout(
    schema.fields.filter(f => integralTypes(f.dataType)).map(_.name).toSeq,
    schema.fields.filter(f => f.dataType.isInstanceOf[NumericType] &&
      !integralTypes(f.dataType)).map(_.name).toSeq,
    schema.fields.filter(_.dataType == StringType).map(_.name).toSeq)

  /** The Ev-fixture layout — default for standalone `parse` calls. */
  val events: MrLayout = of(Encoders.product[Ev].schema)
}

/**
 * MATCH_RECOGNIZE SQL surface over the CEP engine — the reference's
 * `nodes/exec/stream/StreamExecMatch.java:90` +
 * `codegen/MatchCodeGenerator.scala` clause handling, re-expressed as a
 * parser that compiles onto `Cep.Pattern[MrEv]` and projects MEASURES
 * with Spark column expressions over the match's step bindings.
 *
 * Supported subset (documented; everything else raises):
 *  - PARTITION BY any column; ORDER BY any event-time column
 *    (timestamp or epoch-micros long; `ts` resolves to `ts_us`)
 *  - MEASURES `[RUNNING|FINAL] [FIRST|LAST|SUM|COUNT|MIN|MAX|AVG]
 *    (Sym.field)` AS alias — navigation defaults to LAST (SQL FINAL
 *    semantics); `COUNT(Sym.*)` counts the symbol's rows; in ALL ROWS
 *    mode measures default to RUNNING per SQL:2016 (prefix of the
 *    match up to the current row), FIRST/LAST stay navigation
 *  - ONE ROW PER MATCH | ALL ROWS PER MATCH (ALL ROWS adds CLASSIFIER
 *    and the row's numeric/string input columns), with the ALL ROWS
 *    options WITH UNMATCHED ROWS (rows in no match surface with NULL
 *    classifier and measures, emitted once the watermark finalizes
 *    them) and SHOW|OMIT EMPTY MATCHES (identical here — the pattern
 *    grammar requires an unquantified first symbol, so a match always
 *    consumes at least one row and wholly-empty matches cannot arise)
 *  - AFTER MATCH SKIP TO NEXT ROW | SKIP PAST LAST ROW |
 *    SKIP TO [FIRST|LAST] Sym    (default NO_SKIP, as the reference)
 *  - PATTERN (A B+ C? D{1,3} ...) with quantifiers +, ?, *, +?, ??,
 *    *?, {m,n} (m >= 0), {n}, {n,} on non-initial symbols; contiguity
 *    is strict, per MATCH_RECOGNIZE
 *  - ALTERNATION groups `(A | B [| C ...])` of bare symbols: the
 *    consumed row binds to the first alternative whose DEFINE holds
 *    AND whose continuation completes — declared-order preference
 *    with lazy backtracking across the alternatives. The group may
 *    carry a quantifier (`(A | B)+`, `?`, `*` and reluctant forms):
 *    run/optional consumption accepts rows satisfying ANY
 *    alternative, each consumed repetition binding the first
 *    alternative it satisfies (no per-row backtracking inside runs)
 *  - PERMUTE(A, B, ...): the variables in every order over the next n
 *    contiguous rows (lexicographic-expansion preference), via
 *    once-per-match guarded alternation steps
 *  - SUBSET U = (A, B): union variables navigable in MEASURES and
 *    DEFINE as the time-ordered union of the members' rows
 *  - EXCLUSION `{- B -}` (one symbol, quantifiers allowed): B matches
 *    and is visible to measures/DEFINE, but its rows are omitted from
 *    ALL ROWS PER MATCH output, per SQL:2016 (no effect on ONE ROW)
 *  - WITHIN INTERVAL 'n' unit
 *  - DEFINE Sym AS <cmp> [AND ...] where each side of a comparison is
 *    `Sym.field` (the current row), `Other.field` / `LAST(Other.field)`
 *    / `FIRST(Other.field)` (rows bound to another pattern variable —
 *    cross-symbol conditions, compiled onto the NFA's iterative-
 *    condition context), `PREV(Sym.field[, n])` (the row n positions
 *    before the current one in the partition's time-ordered stream),
 *    or a literal. Integral fields and integer literals compare with
 *    full 64-bit precision; a comparison with a missing operand (no
 *    bound row, PREV before start of stream) is FALSE, mirroring SQL
 *    null comparison semantics. Undefined symbols match any row.
 *
 * Scale: parsing is driver-side trivia; execution is `Cep.runBoundBy`
 * (keyed state, watermark-evicted buffer) and a columnar projection —
 * nothing new materializes. SUM/MIN/MAX/AVG measures fold through
 * doubles (2^53 bound on aggregated integral magnitudes); DEFINE
 * comparisons are exact.
 */
object MatchRecognize {

  // ---- DEFINE condition AST ----
  private sealed trait Operand
  private final case class NumLit(v: Double) extends Operand
  private final case class LongLit(v: Long) extends Operand
  private final case class StrLit(v: String) extends Operand
  /** Field of the row being tested (the defining symbol's current row). */
  private final case class CurField(field: String) extends Operand
  /** FIRST/LAST row bound to another pattern variable (bare `Sym.f`
   * from a different symbol = LAST, the reference's default). */
  private final case class NavField(first: Boolean, sym: String, field: String) extends Operand
  /** The row `off` positions before the current one (MATCH_RECOGNIZE
   * PREV — physical stream navigation, any symbol). */
  private final case class PrevField(field: String, off: Int) extends Operand

  final case class Measure(running: Option[Boolean], fn: Option[String],
      sym: String, field: String, alias: String)
  final case class Spec(partitionBy: String, orderBy: String, measures: Seq[Measure],
      skip: Cep.AfterMatch, pattern: Cep.Pattern[MrEv], allRows: Boolean = false,
      excluded: Set[String] = Set.empty,
      subsets: Map[String, Seq[String]] = Map.empty,
      withUnmatched: Boolean = false,
      withTimedOut: Boolean = false,
      orderId: Option[String] = None)

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"MATCH_RECOGNIZE: $msg")

  /** Extract the balanced-paren body of the MATCH_RECOGNIZE clause
   * (quote-aware via [[SqlLexer.closeOf]], so a DEFINE literal
   * containing ')' cannot truncate the spec). */
  private def body(sql: String): String = {
    val kw = sql.toUpperCase.indexOf("MATCH_RECOGNIZE")
    if (kw < 0) fail("no MATCH_RECOGNIZE clause")
    val open = sql.indexOf('(', kw)
    if (open < 0) fail("expected '(' after MATCH_RECOGNIZE")
    val close = SqlLexer.closeOf(sql, open)
    if (close < 0) fail("unbalanced parens")
    sql.substring(open + 1, close)
  }

  /** Slice the body into its ordered sections. Markers match only as
   * whole words (so an alias like `pattern_total` cannot hit `PATTERN`)
   * and only outside single-quoted literals (so a DEFINE literal
   * 'WITHIN' cannot mis-slice the spec) — both via [[SqlLexer]]. */
  private def sections(b: String): Map[String, String] = {
    val markers = Seq("PARTITION BY", "ORDER BY", "MEASURES",
      "ONE ROW PER MATCH", "ALL ROWS PER MATCH", "AFTER MATCH",
      "PATTERN", "SUBSET", "WITHIN", "DEFINE")
    val hits = markers.flatMap(m =>
      SqlLexer.findKeyword(b, m).map { case (s, e) => (m, s, e) }).sortBy(_._2)
    hits.zipWithIndex.map { case ((m, _, e), k) =>
      val end = if (k + 1 < hits.size) hits(k + 1)._2 else b.length
      m -> b.substring(e, end).trim.stripSuffix(",").trim
    }.toMap
  }

  private val PrevRe = """(?i)^PREV\s*\(\s*(\w+)\.(\w+)\s*(?:,\s*(\d+))?\s*\)$""".r
  private val NavRe = """(?i)^(FIRST|LAST)\s*\(\s*(\w+)\.(\w+)\s*\)$""".r
  // identifier-leading on both sides, so a decimal literal like `0.5`
  // can never parse as a symbol.field reference
  private val FieldRe = """^([A-Za-z_]\w*)\.([A-Za-z_]\w*)$""".r
  private val ClassifierRe =
    """(?i)^CLASSIFIER\s*\(\s*\)\s+AS\s+(\w+)$""".r
  // MATCH_ROWTIME() (reference FlinkSqlOperatorTable.java:127): the
  // rowtime of the last row mapped so far — emitted in the ORDER BY
  // column's own type so the output stays a usable time attribute for
  // downstream windows/joins. MATCH_PROCTIME() is intentionally
  // absent: it marks processing time, which has no batch oracle.
  private val MatchRowtimeRe =
    """(?i)^MATCH_ROWTIME\s*\(\s*\)\s+AS\s+(\w+)$""".r
  private val MeasureRe =
    """(?i)^(?:(RUNNING|FINAL)\s+)?(?:(FIRST|LAST|SUM|COUNT|MIN|MAX|AVG)\s*\(\s*)?(\w+)\.(\w+|\*)\s*\)?\s+AS\s+(\w+)$""".r
  private val IntervalRe = """(?i)INTERVAL\s+'(\d+)'\s+(SECOND|MINUTE|HOUR|DAY)S?""".r
  // longest-first so `<=` is not consumed as `<`
  private val CmpSplit = """(<=|>=|<>|=|<|>)"""
  private val IntLit = """^-?\d+$""".r

  private def parseOperand(sym: String, txt0: String): Operand = {
    val txt = txt0.trim
    txt match {
      case PrevRe(_, field, off) =>
        PrevField(field, Option(off).map(_.toInt).getOrElse(1))
      case NavRe(fn, s, field) =>
        if (s.equalsIgnoreCase(sym)) fail(
          s"DEFINE $sym: FIRST/LAST of the defining symbol is not in the subset (use PREV)")
        else NavField(fn.equalsIgnoreCase("FIRST"), s.toUpperCase, field)
      case FieldRe(s, field) =>
        if (s.equalsIgnoreCase(sym)) CurField(field)
        else NavField(first = false, s.toUpperCase, field) // bare other-symbol ref = LAST
      case t if t.startsWith("'") && t.endsWith("'") && t.length >= 2 =>
        StrLit(t.substring(1, t.length - 1))
      case t if IntLit.matches(t) => LongLit(t.toLong) // exact 64-bit literal
      case t =>
        try NumLit(t.toDouble)
        catch { case _: NumberFormatException => fail(s"cannot parse operand '$t'") }
    }
  }

  /** Compile a field name to its typed array getter (None = the field
   * does not exist in the layout — its comparisons are FALSE, the SQL
   * null-comparison behavior). */
  private def fieldGetter(layout: MrLayout, f: String): Option[MrEv => Any] =
    layout.kind.get(f).map {
      case ('l', i) => (e: MrEv) => e.longs(i)
      case ('d', i) => (e: MrEv) => e.nums(i)
      case _ => { val i = layout.kind(f)._2; (e: MrEv) => e.strs(i) }
    }

  /** Compile an operand to its evaluator against the layout. A
   * NavField whose symbol is a SUBSET union variable navigates the
   * time-ordered union of the members' bound rows. */
  private def compileOperand(layout: MrLayout, o: Operand,
      subsets: Map[String, Seq[String]] = Map.empty)
      : (MrEv, Cep.MatchCtx[MrEv]) => Option[Any] = o match {
    case NumLit(v) => (_, _) => Some(v)
    case LongLit(v) => (_, _) => Some(v)
    case StrLit(v) => (_, _) => Some(v)
    case CurField(f) => fieldGetter(layout, f) match {
      case Some(get) => (e, _) => Some(get(e))
      case None => (_, _) => None
    }
    case NavField(first, s, f) => fieldGetter(layout, f) match {
      case Some(get) =>
        val members = subsets.getOrElse(s, Seq(s))
        (_, ctx) => {
          val rows =
            if (members.lengthCompare(1) == 0) ctx.eventsFor(members.head)
            else members.flatMap(ctx.eventsFor).sortBy(e => (e.ts_us, e.id))
          (if (first) rows.headOption else rows.lastOption).map(get)
        }
      case None => (_, _) => None
    }
    case PrevField(f, n) => fieldGetter(layout, f) match {
      case Some(get) => (_, ctx) => ctx.prev(n).map(get)
      case None => (_, _) => None
    }
  }

  private def compare(a: Any, b: Any, op: String): Boolean = (a, b) match {
    // integral/integral first: exact 64-bit compare (no 2^53 collapse)
    case (x: Long, y: Long) => op match {
      case "=" => x == y
      case "<>" => x != y
      case "<" => x < y
      case "<=" => x <= y
      case ">" => x > y
      case ">=" => x >= y
    }
    case (x: Number, y: Number) =>
      val (xd, yd) = (x.doubleValue, y.doubleValue)
      op match {
        case "=" => xd == yd
        case "<>" => xd != yd
        case "<" => xd < yd
        case "<=" => xd <= yd
        case ">" => xd > yd
        case ">=" => xd >= yd
      }
    case (x: String, y: String) => op match {
      case "=" => x == y
      case "<>" => x != y
      case "<" => x < y
      case "<=" => x <= y
      case ">" => x > y
      case ">=" => x >= y
    }
    case _ => false // mixed types never compare true
  }

  private def parseDefine(sym: String, cond: String, layout: MrLayout,
      subsets: Map[String, Seq[String]] = Map.empty): Cep.IterPred[MrEv] = {
    val conjs: Array[((MrEv, Cep.MatchCtx[MrEv]) => Option[Any], String,
        (MrEv, Cep.MatchCtx[MrEv]) => Option[Any])] =
      cond.split("(?i)\\s+AND\\s+").map(_.trim).map { c =>
        val parts = c.split(CmpSplit, 2)
        if (parts.length != 2) fail(s"cannot parse DEFINE condition '$c'")
        val op = c.substring(parts(0).length, c.length - parts(1).length)
        (compileOperand(layout, parseOperand(sym, parts(0)), subsets), op,
          compileOperand(layout, parseOperand(sym, parts(1)), subsets))
      }
    (e, ctx) => conjs.forall { case (l, op, r) =>
      (l(e, ctx), r(e, ctx)) match {
        case (Some(a), Some(b)) => compare(a, b, op)
        case _ => false // missing operand (no bound row / PREV off-stream)
      }
    }
  }

  def parse(sql: String, layout: MrLayout = MrLayout.events): Spec = {
    val sec = sections(body(sql))
    val part = sec.getOrElse("PARTITION BY", fail("PARTITION BY required")).trim
    if (!part.matches("""\w+""")) fail(s"subset: PARTITION BY one column, got '$part'")
    // ORDER BY <time col>[, <unique id col>] — SQL:2016 requires the
    // sort to be deterministic; the optional second key names the
    // unique-id tiebreaker column explicitly in the query text (the
    // programmatic entry points pass it as `idCol` instead)
    val ordRaw = sec.getOrElse("ORDER BY", fail("ORDER BY required")).trim
    val ordParts = ordRaw.split(",").map(_.trim).toSeq
    if (ordParts.isEmpty || ordParts.size > 2 || ordParts.exists(!_.matches("""\w+""")))
      fail(s"ORDER BY takes one time column plus an optional unique-id tiebreaker, got '$ordRaw'")
    val ord = ordParts.head
    val ordId = ordParts.lift(1)

    // SQL:2016 SUBSET: union pattern variables — `SUBSET U = (A, B)`
    // makes U navigable in MEASURES and DEFINE as the time-ordered
    // union of its members' bound rows (reference sql-parser SUBSET
    // clause + MatchCodeGenerator's union-variable handling)
    val subsets: Map[String, Seq[String]] =
      sec.get("SUBSET").map { s =>
        val SubsetRe = """(?s)(\w+)\s*=\s*\(([^()]*)\)""".r
        s.split(",(?![^()]*\\))").map(_.trim).filter(_.nonEmpty).map {
          case SubsetRe(name, members) =>
            val ms = members.split(",").map(_.trim).toSeq
            if (ms.isEmpty || ms.exists(x => !x.matches("""\w+""")))
              fail(s"bad SUBSET member list '($members)'")
            name.toUpperCase -> ms.map(_.toUpperCase)
          case entry => fail(s"cannot parse SUBSET entry '$entry'")
        }.toMap
      }.getOrElse(Map.empty)

    val defines: Map[String, Cep.IterPred[MrEv]] =
      sec.get("DEFINE").map { d =>
        d.split(",(?![^()]*\\))").map(_.trim).filter(_.nonEmpty).map { entry =>
          val m = """(?is)(\w+)\s+AS\s+(.+)""".r
          entry match {
            case m(sym, cond) =>
              if (subsets.contains(sym.toUpperCase))
                fail(s"DEFINE $sym: a SUBSET union variable cannot be defined")
              sym.toUpperCase -> parseDefine(sym, cond, layout, subsets)
            case _ => fail(s"cannot parse DEFINE entry '$entry'")
          }
        }.toMap
      }.getOrElse(Map.empty)

    val patternTxt = sec.getOrElse("PATTERN", fail("PATTERN required"))
      .trim.stripPrefix("(").stripSuffix(")").trim
    val RangeQuant = """^([A-Za-z_][A-Za-z0-9_]*)\{(\d+),(\d+)\}$""".r
    val ExactQuant = """^([A-Za-z_][A-Za-z0-9_]*)\{(\d+)\}$""".r
    val MinQuant = """^([A-Za-z_][A-Za-z0-9_]*)\{(\d+),\}$""".r
    val BareSym = """^[A-Za-z_][A-Za-z0-9_]*$""".r
    // a token is (symbol, quant), an ALTERNATION group's alternative
    // list — `(A | B)`, unquantified (subset) — or a PERMUTE group's
    // variable list; Right's flag is true for PERMUTE
    val rawTokens =
      """(?i:PERMUTE\s*\([^()]*\))|\{-[^}]*-\}|\([^()]*\)[+?*{},0-9]*|[^\s()]+"""
        .r.findAllIn(patternTxt).toSeq
    var excluded = Set.empty[String]
    // Right carries (isPermute, alternatives, groupQuant) — groupQuant
    // is the quantifier on an alternation GROUP, "" when absent
    val tokens: Seq[Either[(String, String), (Boolean, Seq[String], String)]] = rawTokens.map {
      case p0 if p0.length >= 8 && p0.take(7).equalsIgnoreCase("PERMUTE") =>
        // SQL:2016 PERMUTE(A, B, …) — matches the variables in every
        // order (reference sql-parser grammar expands to the
        // lexicographic alternation ((A B) | (B A) | …))
        val syms = p0.drop(p0.indexOf('(') + 1).stripSuffix(")")
          .split(",").map(_.trim).toSeq
        if (syms.length < 2) fail(s"PERMUTE needs at least two variables: '$p0'")
        syms.foreach(s => if (!BareSym.matches(s)) fail(s"bad PERMUTE variable '$s' in '$p0'"))
        Right((true, syms.map(_.toUpperCase), ""))
      case x if x.startsWith("{-") =>
        // SQL:2016 exclusion: the symbol matches normally but its rows
        // are dropped from ALL ROWS output
        val inner = x.stripPrefix("{-").stripSuffix("-}").trim
        val quant = Seq("+?", "??", "*?", "+", "?", "*").find(q => inner.endsWith(q)).getOrElse("")
        val sym = inner.stripSuffix(quant)
        if (!BareSym.matches(sym)) fail(s"exclusion '$x' must wrap one symbol")
        excluded += sym.toUpperCase
        Left((sym.toUpperCase, quant))
      case g if g.startsWith("(") =>
        val close = g.lastIndexOf(')')
        val gq = g.substring(close + 1)
        if (!Set("", "+", "?", "*", "+?", "??", "*?")(gq)) fail(
          s"group quantifier '$gq' is not in the subset (use +, ?, *, +?, ??, *?)")
        val alts = g.substring(1, close).split("\\|").map(_.trim).toSeq
        if (alts.length < 2) fail(s"group '$g' without '|' is not in the subset")
        alts.foreach(a => if (!BareSym.matches(a)) fail(s"bad alternation symbol '$a' in '$g'"))
        Right((false, alts.map(_.toUpperCase), gq))
      case RangeQuant(sym, lo, hi) => Left((sym.toUpperCase, s"{${lo.toInt},${hi.toInt}}"))
      case ExactQuant(sym, n) => // SQL {n} = {n,n}
        Left((sym.toUpperCase, s"{${n.toInt},${n.toInt}}"))
      case MinQuant(sym, lo) => Left((sym.toUpperCase, s"{${lo.toInt},}"))
      case t =>
        val quant = Seq("+?", "??", "*?", "+", "?", "*").find(q => t.endsWith(q)).getOrElse("")
        val sym = t.stripSuffix(quant)
        // reject unsupported quantifier spellings ({m}, {m,}, *) loudly
        // rather than treating them as a never-defined symbol name
        if (!BareSym.matches(sym)) fail(s"unsupported pattern token '$t'")
        Left((sym.toUpperCase, quant))
    }
    if (tokens.isEmpty) fail("empty PATTERN")
    locally {
      val patSyms = tokens.flatMap {
        case Left((sym, _)) => Seq(sym)
        case Right((_, syms, _)) => syms
      }.toSet
      subsets.foreach { case (name, members) =>
        if (patSyms.contains(name))
          fail(s"SUBSET $name collides with a pattern variable")
        members.filterNot(patSyms.contains).foreach(m =>
          fail(s"SUBSET $name member '$m' is not a pattern variable"))
      }
      // exclusion is applied by classifier NAME at output time, so a
      // symbol both inside and outside {- -} would silently drop the
      // non-excluded occurrence's rows — reject it (SQL's positional
      // exclusion is outside the subset)
      val occurrences = tokens.flatMap {
        case Left((sym, _)) => Seq(sym)
        case Right((_, syms, _)) => syms
      }
      excluded.foreach(e => if (occurrences.count(_ == e) > 1)
        fail(s"excluded symbol '$e' is reused outside {- -}"))
    }
    if (tokens.head.exists { case (isPerm, _, gq) => isPerm && gq.nonEmpty })
      fail("subset: a PERMUTE group must be unquantified")
    def pred(sym: String): Cep.IterPred[MrEv] = defines.getOrElse(sym, (_, _) => true)
    def altsOf(syms: Seq[String]): Seq[(String, Cep.IterPred[MrEv])] =
      syms.map(s => s -> pred(s))
    // PERMUTE: each variable binds at most once per match; the
    // matcher's per-alternative branching enumerates the permutations
    def guardedAltsOf(syms: Seq[String]): Seq[(String, Cep.IterPred[MrEv])] =
      syms.map { s =>
        val base = pred(s)
        val g: Cep.IterPred[MrEv] = (e, ctx) => ctx.eventsFor(s).isEmpty && base(e, ctx)
        s -> g
      }
    val Range = """\{(\d+),(\d+)\}""".r
    val MinRange = """\{(\d+),\}""".r
    var pat = tokens.head match {
      case Left((sym, "")) =>
        Cep.Pattern(Vector(Cep.Step[MrEv](sym, pred(sym), strict = false)))
      case Left((sym, q)) =>
        // QUANTIFIED first symbol (`A+ B`, `A? B`, `A* B` …): the
        // reference allows these as long as the pattern as a whole
        // cannot match empty (StreamExecMatch.java:143-145 — that
        // check runs in Cep.validate over the full compiled pattern).
        // The head anchors at each candidate row; strict contiguity
        // makes every branch bind (or fall through) from that row.
        def headQ(qn: Cep.Quant) =
          Cep.Pattern(Vector(Cep.Step[MrEv](sym, pred(sym), strict = true, quant = qn)))
        q match {
          case "+" => headQ(Cep.OneOrMore)
          case "+?" => headQ(Cep.OneOrMoreReluctant)
          case "?" => headQ(Cep.Optional)
          case "??" => headQ(Cep.OptionalReluctant)
          case "*" => headQ(Cep.ZeroOrMore)
          case "*?" => headQ(Cep.ZeroOrMoreReluctant)
          case Range(lo, hi) =>
            val (m, n) = (lo.toInt, hi.toInt)
            if (m < 0 || n < m || n < 1) fail(s"bad range quantifier {$lo,$hi}")
            var p =
              if (m >= 1) Cep.Pattern(Vector(Cep.Step[MrEv](s"$sym#1", pred(sym), strict = false)))
              else Cep.Pattern(Vector(Cep.Step[MrEv](s"$sym#1", pred(sym), strict = true, quant = Cep.Optional)))
            (2 to m).foreach(i => p = p.stepIter(s"$sym#$i", pred(sym), strict = true))
            (math.max(m, 1) + 1 to n).foreach(i =>
              p = p.stepIter(s"$sym#$i", pred(sym), strict = true, Cep.Optional))
            p
          case MinRange(lo) =>
            val m = lo.toInt
            if (m < 1) fail(s"bad range quantifier {$lo,}")
            if (m == 1) Cep.Pattern(Vector(Cep.Step[MrEv](s"$sym#1", pred(sym), strict = true, quant = Cep.OneOrMore)))
            else {
              var p = Cep.Pattern(Vector(Cep.Step[MrEv](s"$sym#1", pred(sym), strict = false)))
              (2 until m).foreach(i => p = p.stepIter(s"$sym#$i", pred(sym), strict = true))
              p.stepIter(s"$sym#$m", pred(sym), strict = true, Cep.OneOrMore)
            }
          case other => fail(s"cannot parse quantifier '$other' on first pattern symbol")
        }
      case Right((isPerm, syms, gq)) =>
        val as = if (isPerm) guardedAltsOf(syms) else altsOf(syms)
        // QUANTIFIED head group (`(A | B)+ C` …): same shape as a body
        // nextAltQuant step — the matcher routes any non-Once head
        // quant through the step matcher anchored at the start row
        val headQuant = gq match {
          case "" => Cep.Once
          case "+" => Cep.OneOrMore
          case "+?" => Cep.OneOrMoreReluctant
          case "?" => Cep.Optional
          case "??" => Cep.OptionalReluctant
          case "*" => Cep.ZeroOrMore
          case "*?" => Cep.ZeroOrMoreReluctant
          case other => fail(s"cannot parse quantifier '$other' on first pattern group")
        }
        var p = Cep.Pattern(Vector(Cep.Step[MrEv](syms.mkString("|"),
          (e, ctx) => as.exists(_._2(e, ctx)),
          strict = headQuant != Cep.Once, quant = headQuant, alts = as)))
        // a PERMUTE group spans n contiguous rows: n-1 further steps
        if (isPerm) (2 to syms.size).foreach(_ => p = p.nextAlt(as))
        p
    }
    tokens.tail.foreach {
      case Right((true, syms, _)) => pat = pat.nextPermute(altsOf(syms))
      case Right((false, syms, "")) => pat = pat.nextAlt(altsOf(syms))
      case Right((false, syms, gq)) =>
        // quantified alternation group: one run/optional step whose
        // repetitions each bind the first alternative they satisfy
        val q = gq match {
          case "+" => Cep.OneOrMore
          case "+?" => Cep.OneOrMoreReluctant
          case "?" => Cep.Optional
          case "??" => Cep.OptionalReluctant
          case "*" => Cep.ZeroOrMore
          case "*?" => Cep.ZeroOrMoreReluctant
        }
        pat = pat.nextAltQuant(altsOf(syms), q)
      case Left((sym, q)) =>
      pat = q match {
        case "" => pat.stepIter(sym, pred(sym), strict = true)
        case "+" => pat.stepIter(sym, pred(sym), strict = true, Cep.OneOrMore)
        case "+?" => pat.stepIter(sym, pred(sym), strict = true, Cep.OneOrMoreReluctant)
        case "?" => pat.stepIter(sym, pred(sym), strict = true, Cep.Optional)
        // strict = true: MATCH_RECOGNIZE contiguity — B?? may only
        // consume the row immediately after the previous step (same
        // as B?; reluctance only flips the skip/include preference)
        case "??" => pat.stepIter(sym, pred(sym), strict = true, Cep.OptionalReluctant)
        case "*" => pat.stepIter(sym, pred(sym), strict = true, Cep.ZeroOrMore)
        case "*?" => pat.stepIter(sym, pred(sym), strict = true, Cep.ZeroOrMoreReluctant)
        case Range(lo, hi) =>
          // SQL {m,n}: m required + (n-m) optional, strict contiguity
          val (m, n) = (lo.toInt, hi.toInt)
          if (m < 0 || n < m || n < 1) fail(s"bad range quantifier {$lo,$hi}")
          var p = pat
          (1 to m).foreach(i => p = p.stepIter(s"$sym#$i", pred(sym), strict = true))
          (m + 1 to n).foreach(i => p = p.stepIter(s"$sym#$i", pred(sym), strict = true, Cep.Optional))
          p
        case MinRange(lo) =>
          // SQL {m,}: (m-1) required + a maximal one-or-more tail —
          // A{2,} is A A+ with every repetition under the A# prefix
          val m = lo.toInt
          if (m < 1) fail(s"bad range quantifier {$lo,}")
          var p = pat
          (1 until m).foreach(i => p = p.stepIter(s"$sym#$i", pred(sym), strict = true))
          p.stepIter(s"$sym#$m", pred(sym), strict = true, Cep.OneOrMore)
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
        // CLASSIFIER(): the matched symbol — last row's under ONE ROW
        // PER MATCH, the current row's under ALL ROWS (SQL:2016).
        // MATCH_NUMBER() is deliberately absent: per-key match
        // numbering needs a non-time window over an append-mode
        // stream, which Spark (correctly) rejects — and the reference
        // does not support it either.
        case ClassifierRe(alias) => Measure(None, Some("CLASSIFIER"), "", "", alias)
        case MatchRowtimeRe(alias) => Measure(None, Some("MATCH_ROWTIME"), "", "", alias)
        case MeasureRe(rf, fn, sym, field, alias) =>
          val f = Option(fn).map(_.toUpperCase)
          if (field == "*" && !f.contains("COUNT")) fail(s"only COUNT accepts ${sym}.*")
          Measure(Option(rf).map(_.equalsIgnoreCase("RUNNING")), f,
            sym.toUpperCase, field, alias)
        case m => fail(s"cannot parse measure '$m'")
      }
    // ALL ROWS PER MATCH output-mode options (SQL:2016; reference
    // MatchCodeGenerator RowsPerMatch handling): WITH UNMATCHED ROWS
    // emits never-matched rows with NULL classifier/measures.
    // SHOW EMPTY MATCHES (the standard's default) and OMIT EMPTY
    // MATCHES are both accepted and behave identically: the pattern
    // grammar requires an unquantified first symbol, so a match always
    // consumes at least one row and wholly-empty matches cannot arise.
    val allRowsOpts = sec.get("ALL ROWS PER MATCH").map(_.trim.toUpperCase).getOrElse("")
    val withUnmatched = """\bWITH\s+UNMATCHED\s+ROWS\b""".r.findFirstIn(allRowsOpts).isDefined
    val showEmpty = """\bSHOW\s+EMPTY\s+MATCHES\b""".r.findFirstIn(allRowsOpts).isDefined
    val omitEmpty = """\bOMIT\s+EMPTY\s+MATCHES\b""".r.findFirstIn(allRowsOpts).isDefined
    val leftover = allRowsOpts
      .replaceAll("""(?i)\bWITH\s+UNMATCHED\s+ROWS\b""", "")
      .replaceAll("""(?i)\b(SHOW|OMIT)\s+EMPTY\s+MATCHES\b""", "").trim
    if (leftover.nonEmpty) fail(s"cannot parse ALL ROWS PER MATCH options '$leftover'")
    if (showEmpty && omitEmpty) fail("SHOW and OMIT EMPTY MATCHES are mutually exclusive")
    // ONE ROW PER MATCH WITH TIMED OUT MATCHES (engine extension — the
    // SQL standard has no timeout output; the reference surfaces the
    // same information through PatternStream.flatSelect's timeout tag /
    // TimedOutPartialMatchHandler, cep/PatternStream.java:26): each
    // partial match whose WITHIN window closes before completing emits
    // one row with measures over the PARTIAL binding, flagged by an
    // extra `timed_out` boolean output column (false on completes).
    val oneRowOpts = sec.get("ONE ROW PER MATCH").map(_.trim.toUpperCase).getOrElse("")
    val withTimedOut =
      """\bWITH\s+TIMED\s+OUT\s+MATCHES\b""".r.findFirstIn(oneRowOpts).isDefined
    val oneRowLeft = oneRowOpts
      .replaceAll("""(?i)\bWITH\s+TIMED\s+OUT\s+MATCHES\b""", "").trim
    if (oneRowLeft.nonEmpty)
      fail(s"cannot parse ONE ROW PER MATCH options '$oneRowLeft'")
    Spec(part, ord, measures, skip, pat,
      allRows = sec.contains("ALL ROWS PER MATCH"), excluded = excluded,
      subsets = subsets, withUnmatched = withUnmatched,
      withTimedOut = withTimedOut, orderId = ordId)
  }

  /** Ev-fixture shim (the original entry): events stream, id column
   * `event_id`. */
  def run(events: Dataset[Ev], sql: String): DataFrame =
    run(events.toDF(), sql, "event_id")
  def run(events: Dataset[Ev], sql: String, watermarkDelay: String): DataFrame =
    run(events.toDF(), sql, "event_id", watermarkDelay)

  /**
   * Execute a MATCH_RECOGNIZE query over ANY input schema. `idCol`
   * names a unique Long id column (deterministic order ties + match
   * dedup). ONE ROW PER MATCH: partition key + measures. ALL ROWS PER
   * MATCH: one row per matched event — partition key, CLASSIFIER (the
   * step's symbol, range expansions collapsed), the event's numeric
   * and string input columns, then the measures (RUNNING by default,
   * per SQL:2016; FIRST/LAST stay navigation).
   */
  def run(df: DataFrame, sql: String, idCol: String,
      watermarkDelay: String = "1 hour"): DataFrame =
    exec(df, sql, idCol, Some(watermarkDelay))

  /** BATCH-mode MATCH_RECOGNIZE (reference `BatchExecMatch` — the
   * same SQL runs in bounded queries): identical parse, compile, and
   * measure projection; the matcher runs once per key over the sorted
   * bounded input via [[Cep.batchBoundBy]] — no watermark machinery,
   * and WITH UNMATCHED ROWS needs no WITHIN (the full input makes
   * 'participates in no match' exact). */
  def runBatch(df: DataFrame, sql: String, idCol: String): DataFrame =
    exec(df, sql, idCol, None)

  private def exec(df: DataFrame, sql: String, idCol: String,
      streamingDelay: Option[String]): DataFrame = {
    val schema = df.schema
    val layout = MrLayout.of(schema)
    val spec = parse(sql, layout)
    val names = schema.fieldNames.toSet
    if (!names.contains(spec.partitionBy)) fail(s"PARTITION BY ${spec.partitionBy}: no such column")
    // the ORDER BY tiebreaker in the query text wins over the
    // programmatic idCol parameter (the SQL is authoritative)
    val effIdCol = spec.orderId.getOrElse(idCol)
    if (effIdCol.isEmpty)
      fail("no unique-id column: add a tiebreaker (ORDER BY ts, id) or pass idCol")
    if (!names.contains(effIdCol)) fail(s"id column $effIdCol: no such column")
    // loud, not silent: a non-integral id would cast to all-NULL longs
    // and corrupt tie ordering + match dedup
    schema(effIdCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case t => fail(s"id column $effIdCol must be integral (unique Long), got $t")
    }
    // ORDER BY resolution: the column itself, else `<name>_us` (the
    // epoch-micros convention of the streaming layer)
    val ordName =
      if (names.contains(spec.orderBy)) spec.orderBy
      else if (names.contains(spec.orderBy + "_us")) spec.orderBy + "_us"
      else fail(s"ORDER BY ${spec.orderBy}: no such column")
    val ordExpr = schema(ordName).dataType match {
      case TimestampType | TimestampNTZType => unix_micros(col(ordName).cast("timestamp"))
      case LongType | IntegerType | ShortType | ByteType => col(ordName).cast("long")
      case t => fail(s"ORDER BY $ordName: unsupported type $t")
    }
    def arrOf(fields: Seq[String], cast: String, elem: DataType): Column =
      if (fields.isEmpty) array().cast(ArrayType(elem))
      else array(fields.map(f => col(f).cast(cast)): _*)
    implicit val mrEnc: Encoder[MrEv] = Encoders.product[MrEv]
    val evs = df.select(col(spec.partitionBy).cast("string").as("key"),
      ordExpr.as("ts_us"), col(effIdCol).cast("long").as("id"),
      arrOf(layout.longFields, "long", LongType).as("longs"),
      arrOf(layout.numFields, "double", DoubleType).as("nums"),
      arrOf(layout.strFields, "string", StringType).as("strs")).as[MrEv]
    if (spec.withUnmatched && !spec.allRows)
      fail("WITH UNMATCHED ROWS requires ALL ROWS PER MATCH")
    if (spec.withUnmatched && streamingDelay.isDefined &&
        spec.pattern.withinUs == Long.MaxValue)
      fail("WITH UNMATCHED ROWS requires WITHIN (watermark eviction of the " +
        "within horizon is what makes 'participates in no match' final)")
    if (spec.withTimedOut && spec.allRows)
      fail("WITH TIMED OUT MATCHES requires ONE ROW PER MATCH")
    if (spec.withTimedOut && streamingDelay.isEmpty)
      fail("WITH TIMED OUT MATCHES is a streaming mode (a bounded input " +
        "has no timeout channel — every within window closes at end of input)")
    if (spec.withTimedOut && spec.pattern.withinUs == Long.MaxValue)
      fail("WITH TIMED OUT MATCHES requires WITHIN (watermark eviction of " +
        "the within horizon IS the timeout point)")
    val bound = streamingDelay match {
      case Some(delay) => Cep.runBoundBy(evs, spec.pattern, "key", "ts_us", "id",
        delay, unmatched = spec.withUnmatched, timedOut = spec.withTimedOut).toDF()
      case None => Cep.batchBoundBy(evs, spec.pattern, "key", "ts_us", "id",
        unmatched = spec.withUnmatched).toDF()
    }

    // cast a measure back to the input column's type (aggregates fold
    // through doubles; integral sources surface as their integral type)
    def srcCast(c: Column, field: String): Column = schema.fields.find(_.name == field) match {
      case Some(f) if Set[DataType](LongType, IntegerType, ShortType, ByteType)(f.dataType) => c.cast(f.dataType)
      case _ => c
    }
    // typed array accessors per the compiled layout (1-based element_at)
    def kindIdx(f: String): (Char, Int) = layout.kind.getOrElse(f,
      fail(s"measure field '$f': no such numeric/string column"))
    def numOf(b: Column, f: String): Column = kindIdx(f) match {
      case ('l', i) => element_at(b.getField("ev").getField("longs"), i + 1).cast("double")
      case ('d', i) => element_at(b.getField("ev").getField("nums"), i + 1)
      case _ => fail(s"measure field '$f' is a string (numeric aggregate)")
    }
    def measureCol(m: Measure, binds: Column): Column = {
      // a SUBSET union variable gathers every member's rows; binds are
      // already in consumption (time) order, so FIRST/LAST and the
      // running-prefix slices navigate the union correctly
      val symsOf = spec.subsets.getOrElse(m.sym, Seq(m.sym))
      val arr = filter(binds, b => symsOf.map(s =>
        b.getField("step") === s || b.getField("step").startsWith(s + "#"))
        .reduce(_ || _))
      m.fn match {
        case Some("CLASSIFIER") => // last matched row's symbol ('#'
          // range expansions collapse to the declared variable)
          split(element_at(binds, -1).getField("step"), "#").getItem(0)
        case Some("MATCH_ROWTIME") =>
          // the rowtime of the last row mapped so far (reference
          // FlinkSqlOperatorTable.MATCH_ROWTIME; under ONE ROW PER
          // MATCH that is the match's last row — Flink's only output
          // mode). Emitted in the ORDER BY column's own type so it
          // remains a time attribute downstream; an integral rowtime
          // source passes through unscaled.
          val us = element_at(binds, -1).getField("ev").getField("ts_us")
          schema(ordName).dataType match {
            case TimestampType => timestamp_micros(us)
            case TimestampNTZType => timestamp_micros(us).cast(TimestampNTZType)
            case _ => us
          }
        case Some("COUNT") => size(arr).cast("long")
        case Some("SUM") => srcCast(aggregate(arr, lit(0.0), (acc, b) => acc + numOf(b, m.field)), m.field)
        case Some("MIN") => srcCast(array_min(transform(arr, numOf(_, m.field))), m.field)
        case Some("MAX") => srcCast(array_max(transform(arr, numOf(_, m.field))), m.field)
        case Some("AVG") => aggregate(arr, lit(0.0), (acc, b) => acc + numOf(b, m.field)) / size(arr)
        case fn =>
          // try_element_at: a symbol with no bound rows (e.g. the
          // other branch of an alternation) navigates to NULL, not an
          // out-of-bounds error
          val pick = if (fn.contains("FIRST")) try_element_at(arr, lit(1))
            else try_element_at(arr, lit(-1))
          // navigation projects a SINGLE row's field: integral fields
          // stay on the longs array end-to-end (no double round-trip —
          // ids above 2^53 must survive; only the SUM/MIN/MAX/AVG
          // folds above carry the documented double-fold caveat)
          kindIdx(m.field) match {
            case ('s', i) => element_at(pick.getField("ev").getField("strs"), i + 1)
            case ('l', i) => srcCast(
              element_at(pick.getField("ev").getField("longs"), i + 1), m.field)
            case (_, i) => element_at(pick.getField("ev").getField("nums"), i + 1)
          }
      }
    }
    val partCol = col("key").cast(schema(spec.partitionBy).dataType).as(spec.partitionBy)

    if (!spec.allRows) {
      // ONE ROW PER MATCH: all measures are FINAL (the full match).
      // Under WITH TIMED OUT MATCHES the timeout channel's binds carry
      // "__timedout:"-prefixed step names — normalize them back so
      // measures evaluate over the partial binding (the reference hands
      // its timeout handler the partial Map<String, List<T>> the same
      // way), and surface the channel as a `timed_out` boolean column.
      if (!spec.withTimedOut)
        bound.select(partCol +: spec.measures.map(m => measureCol(m, col("binds")).as(m.alias)): _*)
      else {
        val isTimedOut = col("binds").getItem(0).getField("step")
          .startsWith(Cep.TimedOutStep + ":")
        val normBinds = transform(col("binds"), b => struct(
          regexp_replace(b.getField("step"),
            "^" + Cep.TimedOutStep + ":", "").as("step"),
          b.getField("ev").as("ev")))
        bound.select(partCol +: isTimedOut.as("timed_out") +:
          spec.measures.map(m => measureCol(m, normBinds).as(m.alias)): _*)
      }
    } else {
      val exploded = bound.select(Seq(col("key"), col("binds"),
        posexplode(col("binds")).as(Seq("__pos", "__b"))): _*)
      val rowCols = schema.fields.toSeq
        .filter(f => f.name != spec.partitionBy && layout.kind.contains(f.name))
        .map { f =>
          val c = layout.kind(f.name) match {
            case ('l', i) => element_at(col("__b.ev.longs"), i + 1).cast(f.dataType)
            case ('d', i) => element_at(col("__b.ev.nums"), i + 1).cast(f.dataType)
            case (_, i) => element_at(col("__b.ev.strs"), i + 1)
          }
          c.as(f.name)
        }
      // WITH UNMATCHED ROWS: the engine surfaces never-matched rows as
      // one-bind pseudo-matches named Cep.UnmatchedStep — their
      // classifier and every measure are NULL per SQL:2016
      val clsRaw = expr("split(__b.step, '#')[0]")
      val isUnmatched = clsRaw === Cep.UnmatchedStep
      val mCols = spec.measures.map { m =>
        // SQL:2016 ALL ROWS default: aggregates are RUNNING (prefix up
        // to the current row); navigation (FIRST/LAST/bare) is FINAL
        // unless RUNNING is requested explicitly; CLASSIFIER() is the
        // CURRENT row's symbol
        val c =
          if (m.fn.contains("CLASSIFIER")) clsRaw
          else {
            val isAgg = m.fn.exists(Set("SUM", "COUNT", "MIN", "MAX", "AVG"))
            val running = m.running.getOrElse(isAgg)
            val binds = if (running) slice(col("binds"), lit(1), col("__pos") + 1) else col("binds")
            measureCol(m, binds)
          }
        (if (spec.withUnmatched) when(isUnmatched, lit(null)).otherwise(c) else c).as(m.alias)
      }
      val clsCol =
        if (spec.withUnmatched) when(isUnmatched, lit(null).cast("string")).otherwise(clsRaw)
        else clsRaw
      val rows = exploded.select(Seq(partCol,
        clsCol.as("classifier")) ++ rowCols ++ mCols: _*)
      // {- X -}: excluded symbols' rows are dropped from ALL ROWS output
      // (NULL-classifier unmatched rows must survive the filter)
      if (spec.excluded.isEmpty) rows
      else rows.filter(col("classifier").isNull ||
        !col("classifier").isin(spec.excluded.toSeq: _*))
    }
  }
}
