package graft.sqlx

import graft.SparkSuite

/** Differential fuzzer for the SIMILAR TO front-end (reference
 * StringCallGen.scala:74-76): random patterns drawn from the SQL:2016
 * similar-pattern grammar (alternation, quantifiers incl. {n,m},
 * groups, character classes with ranges and negation, % / _
 * wildcards, regex metacharacters as literals, ESCAPE) are matched
 * against random strings TWO independent ways — the shipped
 * [[SimilarToSql.toJavaRegex]] translation run through
 * `java.util.regex`, and a test-local backtracking interpreter of the
 * SIMILAR grammar written directly against SQL:2016 9.24 semantics
 * (whole-string match, no anchors, `%`/`_` wildcards). Any divergence
 * is a real translation bug. A final batch runs through the SQL door
 * (`desugar` → Spark `regexp_like`) to pin the rewrite path too. */
class SimilarToDifferentialSpec extends SparkSuite {

  // ---- independent SIMILAR interpreter (test-local oracle) ----

  private sealed trait N
  private case class Lit(c: Char) extends N
  private case object One extends N // _
  private case object Many extends N // %
  private case class Cls(neg: Boolean, singles: Set[Char],
      ranges: List[(Char, Char)]) extends N
  private case class Grp(branches: List[List[N]]) extends N
  private case class Rep(inner: N, min: Int, max: Int) extends N // max -1 = ∞

  private def parse(p: String, esc: Option[Char]): List[List[N]] = {
    var i = 0
    def parseAlt(): List[List[N]] = {
      var branches = List(parseSeq())
      while (i < p.length && p.charAt(i) == '|') { i += 1; branches ::= parseSeq() }
      branches.reverse
    }
    def parseSeq(): List[N] = {
      val buf = scala.collection.mutable.ListBuffer[N]()
      while (i < p.length && p.charAt(i) != '|' && p.charAt(i) != ')')
        buf += parseFactor()
      buf.toList
    }
    def parseFactor(): N = {
      val prim = parsePrim()
      if (i < p.length) p.charAt(i) match {
        case '*' => i += 1; Rep(prim, 0, -1)
        case '+' => i += 1; Rep(prim, 1, -1)
        case '?' => i += 1; Rep(prim, 0, 1)
        case '{' =>
          val close = p.indexOf('}', i)
          val body = p.substring(i + 1, close); i = close + 1
          val parts = body.split(",", -1)
          if (parts.length == 1) { val n = parts(0).toInt; Rep(prim, n, n) }
          else Rep(prim, parts(0).toInt,
            if (parts(1).isEmpty) -1 else parts(1).toInt)
        case _ => prim
      } else prim
    }
    def parsePrim(): N = {
      val c = p.charAt(i)
      if (esc.contains(c)) { i += 2; Lit(p.charAt(i - 1)) }
      else c match {
        case '%' => i += 1; Many
        case '_' => i += 1; One
        case '(' =>
          i += 1; val b = parseAlt()
          require(i < p.length && p.charAt(i) == ')', s"unclosed group in '$p'")
          i += 1; Grp(b)
        case '[' =>
          i += 1
          val neg = p.charAt(i) == '^'
          if (neg) i += 1
          var singles = Set.empty[Char]
          var ranges = List.empty[(Char, Char)]
          while (p.charAt(i) != ']') {
            val a = p.charAt(i)
            if (i + 2 < p.length && p.charAt(i + 1) == '-' && p.charAt(i + 2) != ']') {
              ranges ::= (a, p.charAt(i + 2)); i += 3
            } else { singles += a; i += 1 }
          }
          i += 1
          Cls(neg, singles, ranges)
        case other => i += 1; Lit(other)
      }
    }
    val r = parseAlt()
    require(i == p.length, s"trailing pattern text at $i in '$p'")
    r
  }

  private def interp(branches: List[List[N]], s: String): Boolean = {
    def mSeq(ns: List[N], pos: Int, k: Int => Boolean): Boolean = ns match {
      case Nil => k(pos)
      case h :: t => mOne(h, pos, j => mSeq(t, j, k))
    }
    def mOne(n: N, pos: Int, k: Int => Boolean): Boolean = n match {
      case Lit(c) => pos < s.length && s.charAt(pos) == c && k(pos + 1)
      case One => pos < s.length && k(pos + 1)
      case Many => (pos to s.length).exists(k)
      case Cls(neg, singles, ranges) => pos < s.length && {
        val c = s.charAt(pos)
        val in = singles.contains(c) ||
          ranges.exists { case (a, b) => c >= a && c <= b }
        in != neg && k(pos + 1)
      }
      case Grp(bs) => bs.exists(b => mSeq(b, pos, k))
      case Rep(inner, min, max) =>
        // iteration cap guards zero-width inner matches (e.g. (a|%){2})
        def go(p2: Int, cnt: Int): Boolean =
          (cnt >= min && k(p2)) ||
            ((max < 0 || cnt < max) && cnt <= min + (s.length - pos) + 1 &&
              mOne(inner, p2, j => go(j, cnt + 1)))
        go(pos, 0)
    }
    branches.exists(b => mSeq(b, 0, _ == s.length))
  }

  // ---- pattern / string generators ----

  private val litChars = "abc.^$d" // includes regex metachars as SIMILAR literals
  private val clsChars = "abc%_.d" // wildcards are literal inside a class
  private val escapables = "%_|()!*+?"

  private def genPattern(rnd: scala.util.Random, esc: Boolean): String = {
    def lit(): String = {
      if (esc && rnd.nextInt(4) == 0)
        "!" + escapables.charAt(rnd.nextInt(escapables.length))
      else litChars.charAt(rnd.nextInt(litChars.length)).toString
    }
    def cls(): String = {
      val neg = if (rnd.nextInt(4) == 0) "^" else ""
      val items = (0 until 1 + rnd.nextInt(3)).map { _ =>
        if (rnd.nextInt(3) == 0) {
          val a = ('a' + rnd.nextInt(3)).toChar
          val b = (a + 1 + rnd.nextInt(3)).toChar
          s"$a-$b"
        } else clsChars.charAt(rnd.nextInt(clsChars.length)).toString
      }
      s"[$neg${items.mkString}]"
    }
    def quant(): String = rnd.nextInt(6) match {
      case 0 => "*"
      case 1 => "+"
      case 2 => "?"
      case 3 => val n = rnd.nextInt(3); s"{$n}"
      case 4 => val n = rnd.nextInt(3); s"{$n,}"
      case _ =>
        val n = rnd.nextInt(3); val m = n + rnd.nextInt(3)
        s"{$n,$m}"
    }
    def alt(depth: Int): String =
      (0 until 1 + rnd.nextInt(2)).map(_ => seq(depth)).mkString("|")
    def seq(depth: Int): String =
      (0 until 1 + rnd.nextInt(3)).map(_ => factor(depth)).mkString
    def factor(depth: Int): String = {
      val r = rnd.nextInt(100)
      val prim =
        if (r < 45 || depth >= 2) lit()
        else if (r < 55) "_"
        else if (r < 65) "%"
        else if (r < 80) cls()
        else s"(${alt(depth + 1)})"
      // quantifying % would splice ".**" into the regex — the grammar
      // gives % no quantifier (it already means any-length)
      if (prim != "%" && rnd.nextInt(100) < 30) prim + quant() else prim
    }
    alt(0)
  }

  private val strChars = "abcde01.^$!"
  private def genString(rnd: scala.util.Random): String =
    (0 until rnd.nextInt(9)).map(_ => strChars.charAt(rnd.nextInt(strChars.length))).mkString

  test("translation equals the grammar interpreter on 800 random patterns") {
    val rnd = new scala.util.Random(20260815L)
    var checked = 0
    for (case_ <- 0 until 800) {
      val useEsc = rnd.nextInt(5) == 0
      val escOpt = if (useEsc) Some('!') else None
      val pat = genPattern(rnd, useEsc)
      val regex = SimilarToSql.toJavaRegex(pat, escOpt)
      val compiled = java.util.regex.Pattern.compile(regex)
      val ast = parse(pat, escOpt)
      for (_ <- 0 until 12) {
        val s = genString(rnd)
        val viaRegex = compiled.matcher(s).matches()
        val viaInterp = interp(ast, s)
        assert(viaRegex == viaInterp,
          s"case $case_: pattern '$pat' (esc=$useEsc → $regex) on '$s': " +
            s"regex=$viaRegex interpreter=$viaInterp")
        checked += 1
      }
    }
    assert(checked == 9600)
  }

  test("SQL door: desugared SIMILAR TO agrees with the interpreter") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(20260816L)
    val strings = (0 until 40).map(_ => genString(rnd)).distinct
    strings.toDF("v").createOrReplaceTempView("simto_fuzz")
    val env = new graft.api.TableEnv(spark)
    val pats = (0 until 8).map(_ => genPattern(rnd, esc = false)) ++
      (0 until 4).map(_ => genPattern(rnd, esc = true))
    val cols = pats.zipWithIndex.map { case (p, i) =>
      val escClause = if (i >= 8) " ESCAPE '!'" else ""
      s"v SIMILAR TO '${p.replace("'", "''")}'$escClause AS m$i"
    }
    val rows = env.sqlQuery(
        s"SELECT v, ${cols.mkString(", ")} FROM simto_fuzz ORDER BY v")
      .collect()
    for (r <- rows; i <- pats.indices) {
      val v = r.getString(0)
      val escOpt = if (i >= 8) Some('!') else None
      val expect = interp(parse(pats(i), escOpt), v)
      assert(r.getBoolean(1 + i) == expect,
        s"SQL door: pattern '${pats(i)}' on '$v': spark=${r.getBoolean(1 + i)} interp=$expect")
    }
  }
}
