package graft.sqlx

/**
 * `[NOT] SIMILAR TO` (SQL:2016 regex-LIKE; reference
 * `flink-table-planner/.../codegen/calls/StringCallGen.scala:74-76`
 * SIMILAR_TO / NOT_SIMILAR_TO, lowered onto Calcite's similar-pattern
 * runtime): the SQL pattern grammar shares alternation `|`, quantifiers
 * `* + ? {n,m}`, grouping `()`, and character classes `[...]` with
 * POSIX regex, but uses LIKE's `%`/`_` wildcards and treats the regex
 * anchors/dot (`^ $ . \`) as literals, and always matches the ENTIRE
 * string.
 *
 * Spark has no SIMILAR TO; the translation to a Java regex + `RLIKE`
 * is SURVEY §2.8's designated mapping. Two surfaces:
 *
 *  - [[toJavaRegex]]: pattern-to-regex translation (exposed for the
 *    `similar_to(str, pattern[, escape])` registered function);
 *  - [[desugar]]: SQL-text rewrite of the infix operator onto
 *    `regexp_like` for the unified SQL door.
 *
 * Documented subset (loud failures, like the other sqlx front-ends):
 * the pattern must be a STRING LITERAL in the query text, and the
 * left operand an identifier chain or a parenthesized/function-call
 * expression directly preceding the keyword.
 */
object SimilarToSql {

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"SIMILAR TO: $msg")

  private val regexSpecials = ".^$\\"

  /** SQL SIMILAR pattern → anchored Java regex. */
  def toJavaRegex(pattern: String, escape: Option[Char] = None): String = {
    val sb = new StringBuilder
    var i = 0
    var inClass = false
    while (i < pattern.length) {
      val c = pattern.charAt(i)
      if (!inClass && escape.contains(c)) {
        if (i + 1 >= pattern.length) fail(s"dangling escape character in '$pattern'")
        val lit = pattern.charAt(i + 1)
        // an escaped char is literal text — regex-escape it if special
        if ("\\^$.|?*+()[]{}".indexOf(lit) >= 0) sb.append('\\')
        sb.append(lit)
        i += 1
      } else if (inClass) {
        // class contents (ranges, leading ^) are shared syntax — verbatim
        if (c == ']') inClass = false
        sb.append(c)
      } else c match {
        case '%' => sb.append(".*")
        case '_' => sb.append('.')
        case '[' => inClass = true; sb.append('[')
        case c if regexSpecials.indexOf(c) >= 0 => sb.append('\\').append(c)
        case other => sb.append(other) // | * + ? ( ) { } and plain chars
      }
      i += 1
    }
    if (inClass) fail(s"unterminated character class in '$pattern'")
    "^(?:" + sb.toString + ")$"
  }

  /** Rewrite every `operand [NOT] SIMILAR TO '<pattern>' [ESCAPE '<c>']`
   * in `query` to `[NOT] regexp_like(operand, '<regex>')`. No-op when
   * the keyword is absent. */
  def desugar(query: String): String = {
    var q = query
    var guard = 0
    while (SqlLexer.findKeyword(q, "SIMILAR TO").isDefined) {
      guard += 1
      if (guard > 64) fail("rewrite did not converge")
      val (kwStart, kwEnd) = SqlLexer.findKeyword(q, "SIMILAR TO").get
      // ---- text order: operand [NOT] SIMILAR TO 'pattern'. Scan back
      // over whitespace, then an optional NOT word, then the operand.
      var preEnd = kwStart
      while (preEnd > 0 && q.charAt(preEnd - 1).isWhitespace) preEnd -= 1
      val negated = preEnd >= 3 &&
        q.substring(preEnd - 3, preEnd).equalsIgnoreCase("NOT") &&
        (preEnd - 3 == 0 || !(q.charAt(preEnd - 4).isLetterOrDigit || q.charAt(preEnd - 4) == '_'))
      var opEnd = if (negated) preEnd - 3 else preEnd
      while (opEnd > 0 && q.charAt(opEnd - 1).isWhitespace) opEnd -= 1
      val opStart = operandStart(q, opEnd)
      if (opStart >= opEnd) fail("no operand before SIMILAR TO")
      // ---- pattern literal
      var i = kwEnd
      while (i < q.length && q.charAt(i).isWhitespace) i += 1
      if (i >= q.length || q.charAt(i) != '\'')
        fail("pattern must be a string literal in the query text")
      val (pat, afterPat) = readLiteral(q, i)
      // ---- optional ESCAPE '<c>'
      var end = afterPat
      var escape: Option[Char] = None
      SqlLexer.findKeyword(q, "ESCAPE", afterPat) match {
        case Some((es, ee)) if q.substring(afterPat, es).isBlank =>
          var j = ee
          while (j < q.length && q.charAt(j).isWhitespace) j += 1
          if (j >= q.length || q.charAt(j) != '\'')
            fail("ESCAPE must be a one-character string literal")
          val (escStr, afterEsc) = readLiteral(q, j)
          if (escStr.length != 1) fail("ESCAPE must be a single character")
          escape = Some(escStr.charAt(0))
          end = afterEsc
        case _ => ()
      }
      // Two Spark-side text hazards when re-embedding the regex as a
      // SQL string literal (both found by SimilarToDifferentialSpec):
      //  - the parser treats backslash as a C-style escape inside
      //    string literals (default spark.sql.parser.escapedStringLiterals
      //    =false), so the regex's literalizing backslashes (\| \. \^)
      //    must be doubled or the pattern's literal metacharacters
      //    silently turn into live regex operators;
      //  - ${...} variable substitution runs over the RAW query text
      //    before parsing, so a literal-$ directly before { (e.g.
      //    pattern '${2,}' → regex '\${2,}') would be substituted
      //    away — rewrite literal $ to its hex form \x24 first. The
      //    trailing anchor $ is the last char and can never start ${.
      val regex = toJavaRegex(pat, escape)
        .replace("\\$", "\\x24") // literal $ outside classes
        .replace("${", "\\x24{") // $ as a class member directly before {
        .replace("\\", "\\\\").replace("'", "''")
      val operand = q.substring(opStart, opEnd)
      val call = s"regexp_like($operand, '$regex')"
      val repl = if (negated) s"(NOT $call)" else s"($call)"
      q = q.substring(0, opStart) + repl + q.substring(end)
    }
    q
  }

  /** Start index of the expression ending (exclusive) at `end`: a
   * trailing `(...)` group (with any directly-attached function name)
   * or a qualified identifier chain. */
  private def operandStart(q: String, end: Int): Int = {
    if (end > 0 && q.charAt(end - 1) == ')') {
      var depth = 0
      var i = end - 1
      var inQ = false
      while (i >= 0) {
        val c = q.charAt(i)
        if (inQ) { if (c == '\'') inQ = false }
        else c match {
          case '\'' => inQ = true
          case ')' => depth += 1
          case '(' =>
            depth -= 1
            if (depth == 0) {
              // include an attached function name, e.g. lower(x)
              var j = i
              while (j > 0 && (q.charAt(j - 1).isLetterOrDigit ||
                q.charAt(j - 1) == '_' || q.charAt(j - 1) == '.')) j -= 1
              return j
            }
          case _ => ()
        }
        i -= 1
      }
      fail("unbalanced parens before SIMILAR TO")
    } else {
      var i = end
      while (i > 0 && (q.charAt(i - 1).isLetterOrDigit ||
        q.charAt(i - 1) == '_' || q.charAt(i - 1) == '.')) i -= 1
      i
    }
  }

  /** Read the single-quoted literal starting at `start` ('' unescapes);
   * returns (content, index after the closing quote). */
  private def readLiteral(q: String, start: Int): (String, Int) = {
    val sb = new StringBuilder
    var i = start + 1
    while (i < q.length) {
      val c = q.charAt(i)
      if (c == '\'') {
        if (i + 1 < q.length && q.charAt(i + 1) == '\'') { sb.append('\''); i += 2 }
        else return (sb.toString, i + 1)
      } else { sb.append(c); i += 1 }
    }
    fail("unterminated string literal")
  }
}
