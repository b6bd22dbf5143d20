package graft.sqlx

import graft.SparkSuite
import graft.streaming.{Cep, Ev}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** MATCH_RECOGNIZE parsing + execution: clause compilation onto
 * Cep.Pattern, FIRST/LAST measures over quantified steps, skip
 * strategies, and the streaming end-to-end path. */
class MatchRecognizeSpec extends SparkSuite {

  private def ev(id: Long, typ: String, tsUs: Long, v: Double = 1.0, user: Long = 1) =
    Ev(id, user, typ, tsUs, v)

  /** Dynamic-row fixture matching what `run` builds from an Ev frame
   * (the MrLayout.events array layout: longs = [event_id, user_id,
   * ts_us], nums = [value], strs = [event_type]). */
  private def mrev(id: Long, typ: String, tsUs: Long, v: Double = 1.0, user: Long = 1) =
    MrEv(user.toString, tsUs, id, Array(id, user, tsUs), Array(v), Array(typ))

  /** Empty iterative-condition context for exercising simple (context-
   * blind) predicates directly. */
  private val noCtx = new Cep.MatchCtx[MrEv] {
    def eventsFor(step: String): Seq[MrEv] = Nil
    def prev(offset: Int): Option[MrEv] = None
  }

  test("parse compiles pattern, quantifiers, within, skip and defines") {
    val spec = MatchRecognize.parse("""
      SELECT * FROM events MATCH_RECOGNIZE (
        PARTITION BY user_id
        ORDER BY ts
        MEASURES FIRST(B.event_id) AS first_b, LAST(B.event_id) AS last_b
        ONE ROW PER MATCH
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (A B+ C?)
        WITHIN INTERVAL '5' MINUTE
        DEFINE A AS A.event_type = 'a', B AS B.value > 2 AND B.value < 10
      )""")
    assert(spec.skip == Cep.SkipPastLast)
    assert(spec.pattern.withinUs == 5L * 60000000)
    assert(spec.pattern.steps.map(_.name) == Vector("A", "B", "C"))
    assert(spec.pattern.steps(1).quant == Cep.OneOrMore)
    assert(spec.pattern.steps(2).quant == Cep.Optional && spec.pattern.steps(2).strict)
    val defB = spec.pattern.steps(1).pred
    assert(defB(mrev(1, "x", 0, 5.0), noCtx) && !defB(mrev(1, "x", 0, 11.0), noCtx))
    // undefined symbol C matches any row
    assert(spec.pattern.steps(2).pred(mrev(1, "anything", 0), noCtx))
  }

  test("PATTERN alternation (A | B) binds the first qualifying alternative") {
    val spec = MatchRecognize.parse("""
      SELECT * FROM events MATCH_RECOGNIZE (
        PARTITION BY user_id
        ORDER BY ts
        MEASURES C.event_id AS c_id, H.event_id AS h_id, L.event_id AS l_id
        ONE ROW PER MATCH
        AFTER MATCH SKIP TO NEXT ROW
        PATTERN (C (H | L))
        WITHIN INTERVAL '30' MINUTE
        DEFINE C AS C.event_type = 'click',
               H AS H.value >= 0.5,
               L AS L.value < 0.5
      )""")
    val altStep = spec.pattern.steps(1)
    assert(altStep.alts.map(_._1) == Seq("H", "L"))
    assert(altStep.quant == Cep.Once && altStep.strict)
    // decimal literal must be a literal, not a symbol.field reference
    assert(altStep.pred(mrev(2, "view", 0, 0.7), noCtx))
    val evs = IndexedSeq(
      mrev(1, "click", 0, 0.9), mrev(2, "view", 60000000L, 0.7),
      mrev(3, "click", 120000000L, 0.1), mrev(4, "view", 180000000L, 0.2))
    val ms = Cep.matchSortedG[MrEv](evs, spec.pattern, _.ts_us, _.id)
    assert(ms.map(_.binds.map(b => (b.step, b.ev.id))) ==
      List(List(("C", 1L), ("H", 2L)), List(("C", 3L), ("L", 4L))))
    // a row satisfying BOTH alternatives binds the first (preference)
    val both = IndexedSeq(mrev(1, "click", 0, 0.9), mrev(2, "view", 1000L, 0.5))
    val ms2 = Cep.matchSortedG[MrEv](both, spec.pattern, _.ts_us, _.id)
    assert(ms2.head.binds.map(_.step) == List("C", "H"))
    // CLASSIFIER() parses as a symbol-less measure
    val cls = MatchRecognize.parse("""
      SELECT * FROM events MATCH_RECOGNIZE (
        PARTITION BY user_id ORDER BY ts
        MEASURES C.event_id AS c_id, CLASSIFIER() AS cls
        ONE ROW PER MATCH
        PATTERN (C (H | L))
        WITHIN INTERVAL '30' MINUTE
        DEFINE C AS C.event_type = 'click', H AS H.value >= 0.5,
               L AS L.value < 0.5)""")
    assert(cls.measures.exists(m => m.fn.contains("CLASSIFIER") && m.alias == "cls"))
    // QUANTIFIED alternation group: (H | L)+ consumes the maximal run
    // of rows satisfying either, each repetition binding its first
    // qualifying alternative — COUNT/LAST per variable span the run
    val quant = MatchRecognize.parse("""
      SELECT * FROM events MATCH_RECOGNIZE (
        PARTITION BY user_id ORDER BY ts
        MEASURES C.event_id AS c_id, COUNT(H.*) AS n_h, COUNT(L.*) AS n_l
        ONE ROW PER MATCH
        PATTERN (C (H | L)+)
        WITHIN INTERVAL '30' MINUTE
        DEFINE C AS C.event_type = 'click',
               H AS H.value >= 0.5, L AS L.value < 0.5
      )""")
    val qs = quant.pattern.steps(1)
    assert(qs.quant == Cep.OneOrMore && qs.alts.map(_._1) == Seq("H", "L"))
    val run = IndexedSeq(
      mrev(1, "click", 0, 0.9), mrev(2, "view", 1000L, 0.7),
      mrev(3, "view", 2000L, 0.2), mrev(4, "view", 3000L, 0.8))
    assert(Cep.matchSortedG[MrEv](run, quant.pattern, _.ts_us, _.id)
      .head.binds.map(b => (b.step, b.ev.id)) ==
      List(("C", 1L), ("H", 2L), ("L", 3L), ("H", 4L)))
    // a RANGE quantifier on a group is still rejected loudly
    intercept[IllegalArgumentException] {
      MatchRecognize.parse("""
        SELECT * FROM x MATCH_RECOGNIZE (
          PARTITION BY user_id ORDER BY ts
          MEASURES A.event_id AS a ONE ROW PER MATCH
          PATTERN (A (B | C){1,3}) DEFINE A AS A.value > 0)""")
    }
  }

  test("PATTERN PERMUTE matches every order, backtracks, prefers listed order") {
    val spec = MatchRecognize.parse("""
      SELECT * FROM events MATCH_RECOGNIZE (
        PARTITION BY user_id
        ORDER BY ts
        MEASURES A.event_id AS a_id, B.event_id AS b_id
        ONE ROW PER MATCH
        AFTER MATCH SKIP TO NEXT ROW
        PATTERN (PERMUTE(A, B))
        WITHIN INTERVAL '30' MINUTE
        DEFINE A AS A.value >= 0.3,
               B AS B.event_type = 'click'
      )""")
    assert(spec.pattern.steps.length == 2)
    assert(spec.pattern.steps.forall(_.alts.map(_._1) == Seq("A", "B")))
    // backtracking: row 1 (click, 0.7) satisfies A and B; row 2 (view,
    // 0.5) satisfies only A. The A-first binding of row 1 strands row
    // 2, so the matcher falls back to row1=B, row2=A.
    val back = IndexedSeq(mrev(1, "click", 0, 0.7), mrev(2, "view", 1000L, 0.5))
    assert(Cep.matchSortedG[MrEv](back, spec.pattern, _.ts_us, _.id)
      .map(_.binds.map(b => (b.step, b.ev.id))) ==
      List(List(("B", 1L), ("A", 2L))))
    // preference: when both orders qualify, (A B) wins — the
    // lexicographic-expansion order of the reference grammar
    val both = IndexedSeq(mrev(3, "click", 0, 0.8), mrev(4, "click", 1000L, 0.9))
    assert(Cep.matchSortedG[MrEv](both, spec.pattern, _.ts_us, _.id)
      .map(_.binds.map(b => (b.step, b.ev.id))) ==
      List(List(("A", 3L), ("B", 4L))))
    // three variables, two fallbacks deep: only the C,B,A assignment of
    // (view 0.2)(click 0.9)(view 0.7) is consistent
    val spec3 = MatchRecognize.parse("""
      SELECT * FROM events MATCH_RECOGNIZE (
        PARTITION BY user_id ORDER BY ts
        MEASURES A.event_id AS a_id ONE ROW PER MATCH
        PATTERN (PERMUTE(A, B, C))
        WITHIN INTERVAL '30' MINUTE
        DEFINE A AS A.value >= 0.6, B AS B.event_type = 'click'
      )""")
    val three = IndexedSeq(mrev(1, "view", 0, 0.2),
      mrev(2, "click", 1000L, 0.9), mrev(3, "view", 2000L, 0.7))
    assert(Cep.matchSortedG[MrEv](three, spec3.pattern, _.ts_us, _.id)
      .map(_.binds.map(b => (b.step, b.ev.id))) ==
      List(List(("C", 1L), ("B", 2L), ("A", 3L))))
    // a variable cannot bind twice even when its DEFINE re-qualifies
    val dup = IndexedSeq(mrev(5, "view", 0, 0.9), mrev(6, "view", 1000L, 0.8))
    assert(Cep.matchSortedG[MrEv](dup, spec.pattern, _.ts_us, _.id).isEmpty)
    // single-variable PERMUTE is rejected loudly
    intercept[IllegalArgumentException] {
      MatchRecognize.parse("""
        SELECT * FROM x MATCH_RECOGNIZE (
          PARTITION BY user_id ORDER BY ts
          MEASURES A.event_id AS a ONE ROW PER MATCH
          PATTERN (PERMUTE(A)) DEFINE A AS A.value > 0)""")
    }
  }

  test("exclusion {- B -} matches normally but is marked excluded") {
    val spec = MatchRecognize.parse("""
      SELECT * FROM events MATCH_RECOGNIZE (
        PARTITION BY user_id
        ORDER BY ts
        MEASURES A.event_id AS a_id, COUNT(B.*) AS n_b
        ALL ROWS PER MATCH
        PATTERN (A {- B -} C)
        WITHIN INTERVAL '10' MINUTE
        DEFINE A AS A.event_type = 'click', C AS C.event_type = 'purchase'
      )""")
    assert(spec.excluded == Set("B"))
    assert(spec.pattern.steps.map(_.name) == Vector("A", "B", "C"))
    // B still CONSUMES its row (it is excluded from output, not from
    // matching): click, view, purchase matches as A, B, C
    val evs = IndexedSeq(
      mrev(1, "click", 0), mrev(2, "view", 1000), mrev(3, "purchase", 2000))
    val ms = Cep.matchSortedG[MrEv](evs, spec.pattern, _.ts_us, _.id)
    assert(ms.map(_.binds.map(b => (b.step, b.ev.id))) ==
      List(List(("A", 1L), ("B", 2L), ("C", 3L))))
    // a non-symbol exclusion is rejected loudly
    intercept[IllegalArgumentException] {
      MatchRecognize.parse("""
        SELECT * FROM x MATCH_RECOGNIZE (
          PARTITION BY user_id ORDER BY ts
          MEASURES A.event_id AS a ONE ROW PER MATCH
          PATTERN (A {- B C -}) DEFINE A AS A.value > 0)""")
    }
  }

  test("SKIP PAST LAST ROW consumes matched rows; NO_SKIP overlaps") {
    // four consecutive clicks: NO_SKIP matches every click with a
    // successor (3 matches); SKIP PAST LAST pairs disjointly (2)
    def sql(skip: String) = s"""
      SELECT * FROM events MATCH_RECOGNIZE (
        PARTITION BY user_id
        ORDER BY ts
        MEASURES A.event_id AS a_id, B.event_id AS b_id
        ONE ROW PER MATCH
        $skip
        PATTERN (A B)
        DEFINE A AS A.event_type = 'click'
      )"""
    val evs = IndexedSeq(
      mrev(1, "click", 0), mrev(2, "click", 1000), mrev(3, "click", 2000),
      mrev(4, "click", 3000))
    def pairs(q: String) = {
      val spec = MatchRecognize.parse(q)
      Cep.matchSortedG[MrEv](evs, spec.pattern, _.ts_us, _.id)
        .map(m => (m.binds.head.ev.id, m.binds.last.ev.id))
    }
    assert(pairs(sql("")) == List((1L, 2L), (2L, 3L), (3L, 4L)))
    assert(pairs(sql("AFTER MATCH SKIP PAST LAST ROW")) == List((1L, 2L), (3L, 4L)))
  }

  test("DEFINE supports cross-symbol references and PREV navigation") {
    val spec = MatchRecognize.parse("""
      SELECT * FROM events MATCH_RECOGNIZE (
        PARTITION BY user_id
        ORDER BY ts
        MEASURES B.event_id AS b_id
        ONE ROW PER MATCH
        PATTERN (A B)
        DEFINE A AS A.event_type = 'a',
               B AS B.value > LAST(A.value) AND B.value > PREV(B.value, 2)
      )""")
    val defB = spec.pattern.steps(1).pred
    val a = mrev(1, "a", 0, 5.0)
    val p0 = mrev(0, "x", -10, 7.0)
    val ctx = new Cep.MatchCtx[MrEv] {
      def eventsFor(step: String): Seq[MrEv] = if (step == "A") Seq(a) else Nil
      def prev(offset: Int): Option[MrEv] = if (offset == 2) Some(p0) else Some(a)
    }
    assert(defB(mrev(2, "b", 10, 8.0), ctx))   // beats A (5.0) and prev2 (7.0)
    assert(!defB(mrev(2, "b", 10, 6.0), ctx))  // beats A but not prev2
    // missing operand (no bound A rows / no prev) → condition is false
    assert(!defB(mrev(2, "b", 10, 8.0), noCtx))
  }

  test("end-to-end: measures project FIRST/LAST of a one-or-more step") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Ev]
    val out = MatchRecognize.run(ms.toDS(), """
      SELECT * FROM events MATCH_RECOGNIZE (
        PARTITION BY user_id
        ORDER BY ts
        MEASURES A.event_id AS a_id, FIRST(B.event_id) AS first_b,
                 LAST(B.event_id) AS last_b, C.event_id AS c_id
        ONE ROW PER MATCH
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (A B+ C)
        DEFINE A AS A.event_type = 'a', B AS B.event_type = 'b',
               C AS C.event_type = 'c'
      )""")
    val q = out.writeStream.format("memory").queryName("t_mr")
      .outputMode("append").start()
    try {
      ms.addData(ev(1, "a", 0), ev(2, "b", 10), ev(3, "b", 20), ev(4, "c", 30))
      q.processAllAvailable()
      val rows = spark.table("t_mr")
        .as[(Long, Long, Long, Long, Long)].collect().toList
      assert(rows == List((1L, 1L, 2L, 3L, 4L)))
    } finally q.stop()
  }

  test("SUBSET union variable navigates members' rows in MEASURES and DEFINE") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val mrSql = """
      SELECT * FROM events MATCH_RECOGNIZE (
        PARTITION BY user_id
        ORDER BY ts
        MEASURES A.event_id AS a_id, COUNT(U.*) AS n_u,
                 SUM(U.value) AS sum_u, LAST(U.event_id) AS last_u
        ONE ROW PER MATCH
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (A B+ C)
        SUBSET U = (B, C)
        WITHIN INTERVAL '10' MINUTE
        DEFINE A AS A.event_type = 'a',
               B AS B.value < 4,
               C AS C.value > LAST(U.value)
      )"""
    // parse: subset registered, DEFINE C navigates U (only B rows are
    // bound while C is being tested — RUNNING semantics of the union)
    val spec = MatchRecognize.parse(mrSql)
    assert(spec.subsets == Map("U" -> Seq("B", "C")))
    val ms = MemoryStream[Ev]
    val out = MatchRecognize.run(ms.toDS(), mrSql)
    val q = out.writeStream.format("memory").queryName("t_mr_sub")
      .outputMode("append").start()
    try {
      // C (v=6) > LAST(U.value) = last B = 3; U in measures spans B,B,C
      ms.addData(ev(1, "a", 0, 1.0), ev(2, "b", 10, 2.0),
        ev(3, "b", 20, 3.0), ev(4, "c", 30, 6.0))
      q.processAllAvailable()
      val rows = spark.table("t_mr_sub")
        .as[(Long, Long, Long, Double, Long)].collect().toList
      assert(rows == List((1L, 1L, 3L, 11.0, 4L)))
    } finally q.stop()
    // subset name colliding with a pattern variable is rejected
    intercept[IllegalArgumentException] {
      MatchRecognize.parse("""
        SELECT * FROM x MATCH_RECOGNIZE (
          PARTITION BY user_id ORDER BY ts
          MEASURES A.event_id AS a ONE ROW PER MATCH
          PATTERN (A B) SUBSET B = (A) DEFINE A AS A.value > 0)""")
    }
    // a member that is not a pattern variable is rejected
    intercept[IllegalArgumentException] {
      MatchRecognize.parse("""
        SELECT * FROM x MATCH_RECOGNIZE (
          PARTITION BY user_id ORDER BY ts
          MEASURES A.event_id AS a ONE ROW PER MATCH
          PATTERN (A B) SUBSET U = (A, Z) DEFINE A AS A.value > 0)""")
    }
  }

  test("range quantifier {m,n}: greedy to max, min enforced, measures span the expansion") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Ev]
    val out = MatchRecognize.run(ms.toDS(), """
      SELECT * FROM events MATCH_RECOGNIZE (
        PARTITION BY user_id
        ORDER BY ts
        MEASURES A.event_id AS a_id, FIRST(B.event_id) AS first_b,
                 LAST(B.event_id) AS last_b, C.event_id AS c_id
        ONE ROW PER MATCH
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (A B{1,2} C)
        DEFINE A AS A.event_type = 'a', B AS B.event_type = 'b',
               C AS C.event_type = 'c'
      )""")
    val q = out.writeStream.format("memory").queryName("t_mr_range")
      .outputMode("append").start()
    try {
      // first match: two Bs (greedy max); second: single B (min)
      ms.addData(ev(1, "a", 0), ev(2, "b", 10), ev(3, "b", 20), ev(4, "c", 30),
        ev(5, "a", 40), ev(6, "b", 50), ev(7, "c", 60))
      q.processAllAvailable()
      val rows = spark.table("t_mr_range")
        .as[(Long, Long, Long, Long, Long)].collect().toList.sortBy(_._2)
      assert(rows == List((1L, 1L, 2L, 3L, 4L), (1L, 5L, 6L, 6L, 7L)))
    } finally q.stop()
  }

  test("exact {n} and min {n,} quantifiers expand onto the step chain") {
    def parseWith(patTxt: String) = MatchRecognize.parse(s"""
      SELECT * FROM events MATCH_RECOGNIZE (
        PARTITION BY user_id ORDER BY ts
        MEASURES FIRST(B.event_id) AS fb, LAST(B.event_id) AS lb
        ONE ROW PER MATCH
        PATTERN ($patTxt)
        WITHIN INTERVAL '10' MINUTE
        DEFINE A AS A.event_type = 'a', B AS B.event_type = 'b')""")
    // {2} = exactly two required strict steps
    val ex = parseWith("A B{2}")
    assert(ex.pattern.steps.map(_.name) == Vector("A", "B#1", "B#2"))
    assert(ex.pattern.steps.drop(1).forall(s => s.quant == Cep.Once && s.strict))
    // {2,} = one required step + a maximal one-or-more tail
    val mn = parseWith("A B{2,}")
    assert(mn.pattern.steps.map(_.name) == Vector("A", "B#1", "B#2"))
    assert(mn.pattern.steps(1).quant == Cep.Once)
    assert(mn.pattern.steps(2).quant == Cep.OneOrMore)
    // over a-b-b-b: {2} consumes exactly two b rows, {2,} all three
    val evs = IndexedSeq(mrev(1, "a", 0), mrev(2, "b", 10),
      mrev(3, "b", 20), mrev(4, "b", 30))
    assert(Cep.matchSortedG[MrEv](evs, ex.pattern, _.ts_us, _.id)
      .head.binds.map(_.ev.id) == List(1L, 2L, 3L))
    assert(Cep.matchSortedG[MrEv](evs, mn.pattern, _.ts_us, _.id)
      .head.binds.map(_.ev.id) == List(1L, 2L, 3L, 4L))
    // a single b fails both ({2} and {2,} need two)
    val one = IndexedSeq(mrev(1, "a", 0), mrev(2, "b", 10), mrev(3, "a", 20))
    assert(Cep.matchSortedG[MrEv](one, ex.pattern, _.ts_us, _.id).isEmpty)
    assert(Cep.matchSortedG[MrEv](one, mn.pattern, _.ts_us, _.id).isEmpty)
    intercept[IllegalArgumentException] { parseWith("A B{0}") }
    intercept[IllegalArgumentException] { parseWith("A B{0,}") }
    // zero-or-more: B* consumes the maximal (possibly empty) run
    val star = parseWith("A B* C")
    assert(star.pattern.steps(1).quant == Cep.ZeroOrMore)
    val evs2 = IndexedSeq(mrev(1, "a", 0), mrev(2, "b", 10),
      mrev(3, "b", 20), mrev(4, "c", 30))
    assert(Cep.matchSortedG[MrEv](evs2, star.pattern, _.ts_us, _.id)
      .head.binds.map(b => (b.step, b.ev.id)) ==
      List(("A", 1L), ("B", 2L), ("B", 3L), ("C", 4L)))
    // empty run: a directly followed by c still matches, B binds nothing
    val empty = IndexedSeq(mrev(1, "a", 0), mrev(2, "c", 10))
    assert(Cep.matchSortedG[MrEv](empty, star.pattern, _.ts_us, _.id)
      .head.binds.map(b => (b.step, b.ev.id)) ==
      List(("A", 1L), ("C", 2L)))
    // {0,2}: zero required, bounded optional expansion
    val z2 = parseWith("A B{0,2} C")
    assert(z2.pattern.steps.map(_.name) == Vector("A", "B#1", "B#2", "C"))
    assert(z2.pattern.steps(1).quant == Cep.Optional)
    assert(Cep.matchSortedG[MrEv](empty, z2.pattern, _.ts_us, _.id)
      .head.binds.map(_.ev.id) == List(1L, 2L))
    // reluctant star: minimal run — empty when C can match immediately
    val lazyStar = parseWith("A B*? C")
    assert(lazyStar.pattern.steps(1).quant == Cep.ZeroOrMoreReluctant)
    // b-rows satisfy undefined C?? no: C undefined matches ANY row, so
    // the reluctant star stops at the first row after A
    val undef = MatchRecognize.parse("""
      SELECT * FROM events MATCH_RECOGNIZE (
        PARTITION BY user_id ORDER BY ts
        MEASURES A.event_id AS a_id, C.event_id AS c_id ONE ROW PER MATCH
        PATTERN (A B*? C)
        WITHIN INTERVAL '10' MINUTE
        DEFINE A AS A.event_type = 'a', B AS B.event_type = 'b',
               C AS C.event_type = 'c')""")
    assert(Cep.matchSortedG[MrEv](evs2, undef.pattern, _.ts_us, _.id)
      .head.binds.map(b => (b.step, b.ev.id)) ==
      List(("A", 1L), ("B", 2L), ("B", 3L), ("C", 4L)))
    // greedy star BACKTRACKS to the empty run when B and C overlap:
    // x(0.6) satisfies B, but consuming it strands C — so the match
    // is A,C with B binding nothing
    val overlap = MatchRecognize.parse("""
      SELECT * FROM events MATCH_RECOGNIZE (
        PARTITION BY user_id ORDER BY ts
        MEASURES A.event_id AS a_id, C.event_id AS c_id ONE ROW PER MATCH
        PATTERN (A B* C)
        WITHIN INTERVAL '10' MINUTE
        DEFINE A AS A.event_type = 'a', B AS B.value < 0.9,
               C AS C.value >= 0.5)""")
    val ov = IndexedSeq(mrev(1, "a", 0, 0.1), mrev(2, "x", 10, 0.6))
    assert(Cep.matchSortedG[MrEv](ov, overlap.pattern, _.ts_us, _.id)
      .head.binds.map(b => (b.step, b.ev.id)) ==
      List(("A", 1L), ("C", 2L)))
  }

  test("ALL ROWS output-mode options: UNMATCHED parses, invalid combos raise") {
    def spec(mode: String, pattern: String = "(A B)", within: String = "WITHIN INTERVAL '10' MINUTE") =
      MatchRecognize.parse(s"""
        SELECT * FROM t MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts
          MEASURES A.event_id AS x
          $mode
          PATTERN $pattern
          $within
          DEFINE A AS A.event_type = 'click', B AS B.event_type = 'purchase'
        )""")
    assert(spec("ALL ROWS PER MATCH WITH UNMATCHED ROWS").withUnmatched)
    assert(!spec("ALL ROWS PER MATCH").withUnmatched)
    // SHOW (the standard default) and OMIT EMPTY MATCHES both parse
    // and behave identically: the unquantified-first-symbol rule means
    // a match always consumes a row, so empty matches cannot arise
    assert(!spec("ALL ROWS PER MATCH OMIT EMPTY MATCHES").withUnmatched)
    assert(!spec("ALL ROWS PER MATCH SHOW EMPTY MATCHES").withUnmatched)
    assert(spec("ALL ROWS PER MATCH SHOW EMPTY MATCHES WITH UNMATCHED ROWS").withUnmatched)
    // SHOW and OMIT together are contradictory
    intercept[IllegalArgumentException] {
      spec("ALL ROWS PER MATCH SHOW EMPTY MATCHES OMIT EMPTY MATCHES")
    }
    // unknown option text raises
    intercept[IllegalArgumentException] { spec("ALL ROWS PER MATCH WITH EXTRA NONSENSE") }
    // ONE ROW PER MATCH takes no options
    intercept[IllegalArgumentException] { spec("ONE ROW PER MATCH WITH UNMATCHED ROWS") }
  }

  test("WITH UNMATCHED ROWS emits non-participating rows with NULL measures") {
    import org.apache.spark.sql.functions.col
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Ev]
    val out = MatchRecognize.run(ms.toDS(), """
      SELECT * FROM t MATCH_RECOGNIZE (
        PARTITION BY user_id
        ORDER BY ts
        MEASURES A.event_id AS a_id
        ALL ROWS PER MATCH WITH UNMATCHED ROWS
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (A B)
        WITHIN INTERVAL '10' MINUTE
        DEFINE A AS A.event_type = 'click', B AS B.event_type = 'purchase'
      )""", watermarkDelay = "0 seconds")
    val q = out.writeStream.format("memory").queryName("t_mr_unm")
      .outputMode("append").start()
    try {
      // user 1: click->purchase pair then a lone view; user 2: lone click
      ms.addData(ev(1, "click", 1000000), ev(2, "purchase", 2000000),
        ev(3, "view", 3000000), ev(4, "click", 1000000, user = 2))
      q.processAllAvailable()
      // two per-key sentinel rounds: round 1 advances the watermark past
      // the data, round 2 invokes each key under it so eviction (and
      // with it the unmatched verdict) happens
      val far = 100L * 86400000000L
      ms.addData(ev(-1, "sentinel", far), ev(-1, "sentinel", far, user = 2))
      q.processAllAvailable()
      ms.addData(ev(-2, "sentinel", far + 1000000),
        ev(-2, "sentinel", far + 1000000, user = 2))
      q.processAllAvailable()
      val rows = spark.table("t_mr_unm").filter(col("event_id") >= 0)
        .orderBy(col("user_id"), col("ts_us"))
        .select("user_id", "classifier", "event_id", "a_id").collect()
      // matched pair with classifiers and the A measure
      val matched = rows.filter(r => !r.isNullAt(1))
      assert(matched.map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq ==
        Seq((1L, "A", 1L, 1L), (1L, "B", 2L, 1L)))
      // the lone view and lone click surface with NULL classifier + measure
      val unmatched = rows.filter(_.isNullAt(1))
      assert(unmatched.map(_.getLong(2)).toSeq == Seq(3L, 4L))
      assert(unmatched.forall(_.isNullAt(3)))
    } finally q.stop()
  }

  test("bare reluctant-optional B?? compiles strict (MATCH_RECOGNIZE contiguity)") {
    val spec = MatchRecognize.parse("""
      SELECT * FROM t MATCH_RECOGNIZE (
        PARTITION BY user_id
        ORDER BY ts
        MEASURES A.event_id AS x
        PATTERN (A B?? C)
        WITHIN INTERVAL '5' MINUTE
        DEFINE A AS A.event_type = 'a', B AS B.event_type = 'b',
               C AS C.event_type = 'c'
      )""")
    val b = spec.pattern.steps(1)
    assert(b.quant == Cep.OptionalReluctant && b.strict,
      "B?? must only consume the immediately-next row, like B?")
  }

  test("unsupported clauses raise, not silently misparse") {
    intercept[IllegalArgumentException] {
      MatchRecognize.parse("SELECT 1") // no clause
    }
    intercept[IllegalArgumentException] {
      MatchRecognize.parse("""
        SELECT * FROM t MATCH_RECOGNIZE (
          PARTITION BY a, b
          ORDER BY ts
          MEASURES A.event_id AS x
          PATTERN (A)
          DEFINE A AS A.value > 0
        )""") // composite partition key outside the subset
    }
    // unsupported quantifier spellings raise instead of silently
    // becoming a never-defined symbol that matches anything
    for (bad <- Seq("B**", "B{,3}", "B{2}?")) {
      intercept[IllegalArgumentException] {
        MatchRecognize.parse(s"""
          SELECT * FROM t MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts
            MEASURES A.event_id AS x
            PATTERN (A $bad)
            DEFINE A AS A.value > 0
          )""")
      }
    }
  }

  test("ORDER BY accepts an in-text unique-id tiebreaker, rejects 3+ keys") {
    val spec = MatchRecognize.parse("""
      SELECT * FROM events MATCH_RECOGNIZE (
        PARTITION BY user_id
        ORDER BY ts, event_id
        MEASURES A.event_id AS x
        PATTERN (A)
        DEFINE A AS A.value > 0
      )""")
    assert(spec.orderBy == "ts" && spec.orderId.contains("event_id"))
    intercept[IllegalArgumentException] {
      MatchRecognize.parse("""
        SELECT * FROM events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts, event_id, value
          MEASURES A.event_id AS x
          PATTERN (A)
          DEFINE A AS A.value > 0
        )""")
    }
  }

  test("a DEFINE literal containing ')' does not truncate the spec") {
    val spec = MatchRecognize.parse("""
      SELECT * FROM events MATCH_RECOGNIZE (
        PARTITION BY user_id
        ORDER BY ts
        MEASURES A.event_id AS a_id, B.event_id AS b_id
        PATTERN (A B)
        DEFINE A AS A.event_type = 'a)b',
               B AS B.value > 7
      )""")
    // both defines survived the quote-aware paren balance
    assert(spec.pattern.steps.map(_.name) == Vector("A", "B"))
    assert(spec.pattern.steps(0).pred(mrev(1, "a)b", 0), noCtx))
    assert(!spec.pattern.steps(1).pred(mrev(2, "x", 0, 5.0), noCtx))
  }

  test("a non-integral id column fails loudly instead of casting to NULL") {
    import spark.implicits._
    val df = Seq(("u1", 1L, "k1")).toDF("user_id", "ts_us", "uuid")
    val e = intercept[IllegalArgumentException] {
      MatchRecognize.run(df, """
        SELECT * FROM t MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts_us
          MEASURES A.ts_us AS a_ts
          PATTERN (A)
          DEFINE A AS A.ts_us >= 0
        )""", "uuid")
    }
    assert(e.getMessage.contains("integral"))
  }

  test("SQL-door desugar rejects subquery inputs and unbalanced specs loudly") {
    // subquery input: the scan-back lands on ')' — not an identifier
    val e1 = intercept[IllegalArgumentException] {
      MatchRecognizeSql.desugar(spark,
        "SELECT * FROM (SELECT 1 AS a) MATCH_RECOGNIZE (PARTITION BY a ORDER BY a PATTERN (X) DEFINE X AS X.a > 0)")
    }
    assert(e1.getMessage.contains("named table"))
    intercept[IllegalArgumentException] {
      MatchRecognizeSql.desugar(spark,
        "SELECT * FROM t MATCH_RECOGNIZE (PARTITION BY a ORDER BY a PATTERN (X")
    }
    // no clause: text passes through untouched
    val q = "SELECT 1 AS match_recognizer"
    assert(MatchRecognizeSql.desugar(spark, q) == q)
  }

  test("quantified first symbol: H+ L anchors the greedy head run") {
    val spec = MatchRecognize.parse("""
      SELECT * FROM events MATCH_RECOGNIZE (
        PARTITION BY user_id
        ORDER BY ts
        MEASURES FIRST(H.event_id) AS start_id, COUNT(H.*) AS n_h
        ONE ROW PER MATCH
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (H+ L)
        WITHIN INTERVAL '1' HOUR
        DEFINE H AS H.value >= 20, L AS L.value < 5
      )""")
    assert(spec.pattern.steps.head.quant == Cep.OneOrMore && spec.pattern.steps.head.strict)
    val m = 60L * 1000000
    val evs = IndexedSeq(
      mrev(1, "x", 1 * m, 30.0), mrev(2, "x", 2 * m, 25.0), mrev(3, "x", 3 * m, 40.0),
      mrev(4, "x", 4 * m, 1.0), // L: closes the 3-H run
      mrev(5, "x", 5 * m, 22.0), mrev(6, "x", 6 * m, 2.0)) // second run
    val ms = Cep.matchSortedG[MrEv](evs, spec.pattern, _.ts_us, _.id)
    assert(ms.map(_.binds.map(b => (b.step, b.ev.id))) ==
      List(List(("H", 1L), ("H", 2L), ("H", 3L), ("L", 4L)),
           List(("H", 5L), ("L", 6L))), s"got $ms")
  }

  test("optional first symbol binds when present and falls through when absent") {
    val spec = MatchRecognize.parse("""
      SELECT * FROM events MATCH_RECOGNIZE (
        PARTITION BY user_id
        ORDER BY ts
        MEASURES B.event_id AS b_id
        ONE ROW PER MATCH
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (A? B)
        WITHIN INTERVAL '1' HOUR
        DEFINE A AS A.event_type = 'a', B AS B.event_type = 'b'
      )""")
    assert(spec.pattern.steps.head.quant == Cep.Optional && spec.pattern.steps.head.strict)
    val m = 60L * 1000000
    val evs = IndexedSeq(mrev(1, "a", 1 * m), mrev(2, "b", 2 * m), mrev(3, "b", 3 * m))
    val ms = Cep.matchSortedG[MrEv](evs, spec.pattern, _.ts_us, _.id)
    assert(ms.map(_.binds.map(b => (b.step, b.ev.id))) ==
      List(List(("A", 1L), ("B", 2L)), List(("B", 3L))), s"got $ms")
  }

  test("patterns that can produce empty matches are rejected, as the reference") {
    val spec = MatchRecognize.parse("""
      SELECT * FROM events MATCH_RECOGNIZE (
        PARTITION BY user_id
        ORDER BY ts
        MEASURES COUNT(A.*) AS n_a
        ONE ROW PER MATCH
        PATTERN (A? B*)
        WITHIN INTERVAL '1' HOUR
        DEFINE A AS A.event_type = 'a', B AS B.event_type = 'b'
      )""")
    val e = intercept[IllegalArgumentException] {
      Cep.matchSortedG[MrEv](IndexedSeq(mrev(1, "a", 0)), spec.pattern, _.ts_us, _.id)
    }
    assert(e.getMessage.contains("empty matches"), e.getMessage)
  }

  test("MATCH_ROWTIME() emits the match's last rowtime in the ORDER BY column's type") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    def mr(order: String) = s"""
      SELECT * FROM t MATCH_RECOGNIZE (
        PARTITION BY user_id
        ORDER BY $order
        MEASURES A.event_id AS a_id, MATCH_ROWTIME() AS mrt
        ONE ROW PER MATCH
        AFTER MATCH SKIP TO NEXT ROW
        PATTERN (A B)
        DEFINE A AS A.event_type = 'a', B AS B.event_type = 'b'
      )"""
    // integral rowtime source: the value passes through unscaled
    val df = Seq(
      (1L, 1L, "a", 1000000L), (1L, 2L, "b", 2000000L),
      (1L, 3L, "a", 3000000L), (1L, 4L, "b", 4000000L)
    ).toDF("user_id", "event_id", "event_type", "ts_us")
    val out = MatchRecognize.runBatch(df, mr("ts_us"), "event_id")
    assert(out.schema("mrt").dataType == LongType)
    assert(out.orderBy("a_id").collect().map(r => (r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 2000000L), (3L, 4000000L)))
    // timestamp rowtime source: re-emitted as a timestamp (a usable
    // downstream time attribute, the reference's purpose for the fn)
    val tdf = df.withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
    val out2 = MatchRecognize.runBatch(tdf, mr("ts"), "event_id")
    assert(out2.schema("mrt").dataType == TimestampType)
    assert(out2.orderBy("a_id").collect().map(_.getTimestamp(2).getTime).toSeq ==
      Seq(2000L, 4000L))
  }
}
