package graft.sqlx

/**
 * Minimal shared SQL lexing primitives for the `sqlx/` text front-ends
 * (MATCH_RECOGNIZE sections, temporal-join desugar, window TVFs,
 * connector DDL). Each front-end keeps its own local grammar; what
 * lives here is the part they all kept re-implementing — and where
 * the subtle bugs breed: single-quote literal tracking (with ''
 * escapes), word-boundary keyword phrase matching outside literals,
 * paren-aware top-level splitting, and clause-region end detection.
 *
 * The reference splits the same concerns between Calcite's lexer and
 * `flink-sql-parser`'s grammar; this engine's front-ends are
 * deliberately small text-to-text rewriters (SURVEY §7.1), so the
 * shared layer is a handful of scanning primitives rather than a full
 * tokenizer.
 */
object SqlLexer {

  /** Spans `[start, end]` (inclusive quote positions) of single-quoted
   * literals. A doubled quote `''` inside a literal reads as two
   * adjacent literals, which is equivalent for span queries. */
  def quotedSpans(s: String): Vector[(Int, Int)] = {
    val spans = Vector.newBuilder[(Int, Int)]
    var i = 0; var start = -1
    while (i < s.length) {
      if (s.charAt(i) == '\'') {
        if (start < 0) start = i else { spans += ((start, i)); start = -1 }
      }
      i += 1
    }
    spans.result()
  }

  /** True when position `i` falls strictly inside a quoted literal. */
  def inQuote(s: String, i: Int): Boolean =
    quotedSpans(s).exists { case (a, b) => i > a && i < b }

  private def wordChar(c: Char): Boolean = c.isLetterOrDigit || c == '_'

  /** Regex for a keyword phrase: words separated by any whitespace. */
  private def phraseRe(phrase: String) =
    ("(?i)" + phrase.trim.split("\\s+").map(java.util.regex.Pattern.quote)
      .mkString("\\s+")).r

  /** First occurrence of `phrase` (case-insensitive, words separated by
   * any whitespace) at a word boundary and outside quoted literals,
   * scanning from `from`. Returns the [start, end) span. */
  def findKeyword(s: String, phrase: String, from: Int = 0): Option[(Int, Int)] = {
    val spans = quotedSpans(s)
    def quoted(i: Int) = spans.exists { case (a, b) => i > a && i < b }
    phraseRe(phrase).findAllMatchIn(s.substring(from)).map(m => (from + m.start, from + m.end))
      .find { case (a, b) =>
        !quoted(a) &&
        (a == 0 || !wordChar(s.charAt(a - 1))) &&
        (b >= s.length || !wordChar(s.charAt(b)))
      }
  }

  /** Split on commas at paren depth 0 and outside quoted literals;
   * segments are trimmed, empties dropped. */
  def splitTop(s: String): Seq[String] = splitTopOn(s, ',')

  /** [[splitTop]] generalized to any single-char separator (e.g. ';'
   * between the statements of a statement set). */
  def splitTopOn(s: String, sep: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0; var inQ = false
    s.foreach { c =>
      if (inQ) { if (c == '\'') inQ = false; cur += c }
      else c match {
        case '\'' => inQ = true; cur += c
        case '(' => depth += 1; cur += c
        case ')' => depth -= 1; cur += c
        case `sep` if depth == 0 => out += cur.toString; cur.clear()
        case _ => cur += c
      }
    }
    if (cur.nonEmpty) out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** Index of the ')' balancing the '(' at `open`, honoring quoted
   * literals; -1 when unbalanced (callers raise their own error). */
  def closeOf(s: String, open: Int): Int = {
    var depth = 0; var inQ = false; var i = open
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQ) { if (c == '\'') inQ = false }
      else c match {
        case '\'' => inQ = true
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) return i
        case _ => ()
      }
      i += 1
    }
    -1
  }

  /** End of the region starting at `start`: the first top-level (paren
   * depth 0, outside literals, word-bounded) occurrence of any stop
   * phrase, an unbalanced ')', or end of text. */
  def regionEnd(s: String, start: Int, stops: Seq[String]): Int = {
    val res = stops.map(phraseRe)
    var depth = 0; var inQ = false
    var i = start
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQ) { if (c == '\'') inQ = false }
      else c match {
        case '\'' => inQ = true
        case '(' => depth += 1
        case ')' if depth == 0 => return i
        case ')' => depth -= 1
        case _ if depth == 0 =>
          val prevIsWord = i > start && wordChar(s.charAt(i - 1))
          if (!prevIsWord && res.exists(re =>
              re.findPrefixMatchOf(s.subSequence(i, s.length)).exists(m =>
                i + m.end >= s.length || !wordChar(s.charAt(i + m.end)))))
            return i
        case _ =>
      }
      i += 1
    }
    s.length
  }
}
