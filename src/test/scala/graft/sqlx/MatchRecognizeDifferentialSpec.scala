package graft.sqlx

import graft.SparkSuite
import graft.streaming.Cep
import scala.util.Random

/**
 * Differential fuzzing of the MATCH_RECOGNIZE front-end + matcher
 * against `java.util.regex` as the SQL:2016 preference-order oracle.
 *
 * Strict-contiguity row patterns over value-band symbols are exactly
 * regular expressions over a classified character string: each event
 * classifies to one char by its value band, each symbol's DEFINE is a
 * contiguous band range (= a regex character class), and the pattern
 * grammar (concatenation, alternation groups, greedy/reluctant
 * quantifiers) maps 1:1 onto regex syntax. Java's backtracking engine
 * implements the same leftmost/greedy/reluctant preference order the
 * standard specifies (reference `MatchCodeGenerator.scala` compiles to
 * the same semantics via Calcite), so match spans must agree:
 *
 *  - AFTER MATCH SKIP TO NEXT ROW  ≡ anchored `lookingAt` at every
 *    start position (one preferred match per starting row);
 *  - AFTER MATCH SKIP PAST LAST ROW ≡ scan-from-0, jump past each
 *    match's last consumed row (leftmost non-overlapping).
 *
 * Patterns are generated with a fixed per-case seed (deterministic CI)
 * and always contain at least one mandatory element, so the empty
 * match never arises on either side.
 */
class MatchRecognizeDifferentialSpec extends SparkSuite {

  private val Bands = 4 // values 0.5..3.5 classify to chars 'a'..'d'

  private def mrev(idx: Int, band: Int): MrEv = {
    val ts = idx * 1000000L
    val id = idx + 1L
    MrEv("1", ts, id, Array(id, 1L, ts), Array(band + 0.5), Array("x"))
  }

  /** One pattern element: 1 symbol (or a 2-symbol alternation group),
   * each symbol matching a contiguous half-open band range, plus a
   * quantifier suffix shared verbatim by the SQL text and the regex. */
  private case class Sym(name: String, lo: Int, hi: Int) {
    def cls: String =
      if (hi - lo == Bands) "." // undefined symbol: matches any row
      else if (hi - lo == 1) ('a' + lo).toChar.toString
      else s"[${('a' + lo).toChar}-${('a' + hi - 1).toChar}]"
    def define: Option[String] =
      if (hi - lo == Bands) None // exercise the undefined-symbol path
      else Some(s"$name AS $name.value >= $lo.0 AND $name.value < $hi.0")
  }
  private case class Elem(syms: List[Sym], quant: String, permute: Boolean = false) {
    def mandatory: Boolean = permute || (quant match {
      case "" | "+" | "+?" => true
      case q if q.startsWith("{") => !q.startsWith("{0")
      case _ => false
    })
    def sqlText: String =
      if (permute) syms.map(_.name).mkString("PERMUTE(", ", ", ")")
      else syms match {
        case List(s) => s.name + quant
        case ss => ss.map(_.name).mkString("(", " | ", ")") + quant
      }
    def regexText: String =
      if (permute) // SQL:2016: lexicographic alternation of the permutations
        syms.permutations.toList.map(_.map(_.cls).mkString)
          .mkString("(?:", "|", ")")
      else syms match {
        case List(s) => s.cls + quant
        case ss => ss.map(_.cls).mkString("(?:", "|", ")") + quant
      }
  }

  private def genCase(seed: Long): (IndexedSeq[Int], List[Elem]) = {
    val rnd = new Random(seed)
    def bandRange(): (Int, Int) = {
      val lo = rnd.nextInt(Bands)
      val hi = lo + 1 + rnd.nextInt(Bands - lo)
      (lo, hi)
    }
    val names = Iterator("A", "B", "C", "D", "E", "F", "G", "H")
    val symQuants = List("", "", "?", "??", "+", "+?", "*", "*?",
      "{2}", "{2,}", "{1,3}", "{2,4}")
    val groupQuants = List("", "?", "??", "+", "+?", "*", "*?")
    def elem(): Elem =
      if (rnd.nextInt(6) == 5) { // PERMUTE group (always unquantified)
        val s1 = { val (l, h) = bandRange(); Sym(names.next(), l, h) }
        val s2 = { val (l, h) = bandRange(); Sym(names.next(), l, h) }
        Elem(List(s1, s2), "", permute = true)
      } else if (rnd.nextInt(3) == 0) { // alternation group
        val s1 = { val (l, h) = bandRange(); Sym(names.next(), l, h) }
        val s2 = { val (l, h) = bandRange(); Sym(names.next(), l, h) }
        Elem(List(s1, s2), groupQuants(rnd.nextInt(groupQuants.length)))
      } else {
        val (l, h) = bandRange()
        Elem(List(Sym(names.next(), l, h)), symQuants(rnd.nextInt(symQuants.length)))
      }
    var elems = List.fill(1 + rnd.nextInt(3))(elem())
    if (!elems.exists(_.mandatory)) // forbid the all-optional pattern
      elems = Elem(List({ val (l, h) = bandRange(); Sym(names.next(), l, h) }), "") :: elems
    val events = IndexedSeq.fill(10 + rnd.nextInt(9))(rnd.nextInt(Bands))
    (events, elems)
  }

  private def parseSpec(elems: List[Elem], skip: String,
      within: Option[Int] = None): MatchRecognize.Spec = {
    val defines = elems.flatMap(_.syms).flatMap(_.define)
    val defineSec =
      if (defines.isEmpty) "" else defines.mkString("DEFINE ", ", ", "")
    val withinSec = within.map(k => s"WITHIN INTERVAL '$k' SECOND").getOrElse("")
    MatchRecognize.parse(s"""
      SELECT * FROM events MATCH_RECOGNIZE (
        PARTITION BY user_id
        ORDER BY ts
        MEASURES CLASSIFIER() AS cls
        ONE ROW PER MATCH
        AFTER MATCH $skip
        PATTERN (${elems.map(_.sqlText).mkString(" ")})
        $withinSec
        $defineSec
      )""")
  }

  /** Engine match spans as (start row idx, last consumed row idx). */
  private def engineSpans(events: IndexedSeq[MrEv], p: Cep.Pattern[MrEv]): List[(Int, Int)] =
    Cep.matchSortedG[MrEv](events, p, _.ts_us, _.id)
      .map(m => ((m.binds.head.ev.id - 1).toInt, (m.binds.last.ev.id - 1).toInt))

  /** Regex oracle spans under the two skip disciplines. A WITHIN of k
   * seconds (events are 1 s apart) admits at most k+1 rows per match;
   * truncating the region to `p + k + 1` enforces exactly the engine's
   * in-window candidate pruning, preserving backtracking preference
   * inside the window. */
  private def oracleSpans(s: String, regex: String, pastLast: Boolean,
      withinRows: Int = Int.MaxValue): List[(Int, Int)] = {
    val m = java.util.regex.Pattern.compile(regex).matcher(s)
    def limit(p: Int): Int = math.min(s.length.toLong, p.toLong + withinRows).toInt
    val out = List.newBuilder[(Int, Int)]
    if (pastLast) {
      var p = 0
      while (p < s.length) {
        m.region(p, limit(p))
        if (m.lookingAt() && m.end() > m.start()) { out += ((p, m.end() - 1)); p = m.end() }
        else p += 1
      }
    } else {
      (0 until s.length).foreach { p =>
        m.region(p, limit(p))
        if (m.lookingAt() && m.end() > m.start()) out += ((p, m.end() - 1))
      }
    }
    out.result()
  }

  test("differential: strict patterns agree with java.util.regex on 800 random cases") {
    for (seed <- 1L to 800L) {
      val (bandSeq, elems) = genCase(seed)
      val events = bandSeq.zipWithIndex.map { case (b, i) => mrev(i, b) }
      val chars = bandSeq.map(b => ('a' + b).toChar).mkString
      val regex = elems.map(_.regexText).mkString
      for ((skipSql, pastLast) <- List("SKIP PAST LAST ROW" -> true, "SKIP TO NEXT ROW" -> false);
           within <- List(None, Some(3))) {
        val spec = parseSpec(elems, skipSql, within)
        val got = engineSpans(events, spec.pattern)
        val want = oracleSpans(chars, regex, pastLast,
          within.map(_ + 1).getOrElse(Int.MaxValue))
        assert(got == want,
          s"\nseed=$seed skip=$skipSql within=$within\nevents=$chars" +
            s"\npattern=${elems.map(_.sqlText).mkString(" ")}" +
            s"\nregex=$regex\nengine=$got\noracle=$want")
      }
    }
  }

  test("differential: WITH UNMATCHED output is the exact row complement on 40 cases") {
    // SQL:2016 §R020 every-row invariant under SKIP PAST LAST: the
    // batch executor's WITH UNMATCHED ROWS channel must emit exactly
    // the rows consumed by NO match — verified against the matcher's
    // own disjoint spans, which the regex differential above pins.
    import org.apache.spark.sql.Encoders
    implicit val enc: org.apache.spark.sql.Encoder[MrEv] = Encoders.product[MrEv]
    for (seed <- 1L to 40L) {
      val (bandSeq, elems) = genCase(seed)
      val events = bandSeq.zipWithIndex.map { case (b, i) => mrev(i, b) }
      val spec = parseSpec(elems, "SKIP PAST LAST ROW", Some(3))
      val out = Cep.batchBoundBy(spark.createDataset(events), spec.pattern,
          "key", "ts_us", "id", unmatched = true)
        .collect().toList
      val (un, ms) = out.partition(_.binds.exists(_.step == Cep.UnmatchedStep))
      val matchedIds = ms.flatMap(_.binds.map(_.ev.id)).toSet
      val unmatchedIds = un.flatMap(_.binds.map(_.ev.id)).toSet
      val allIds = events.map(_.id).toSet
      assert(matchedIds.intersect(unmatchedIds).isEmpty,
        s"seed=$seed: rows both matched and unmatched: ${matchedIds.intersect(unmatchedIds)}")
      assert(matchedIds.union(unmatchedIds) == allIds,
        s"seed=$seed: rows vanished: ${allIds.diff(matchedIds.union(unmatchedIds))}")
      // the matched set equals the pure matcher's consumed rows
      val want = Cep.matchSortedG[MrEv](events, spec.pattern, _.ts_us, _.id)
        .flatMap(_.binds.map(_.ev.id)).toSet
      assert(matchedIds == want, s"seed=$seed: matched-set drift")
    }
  }
}
