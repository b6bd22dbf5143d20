package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions.{col, timestamp_micros}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import scala.reflect.runtime.universe.TypeTag

/** One emitted pattern match: the matched event ids in step order. */
case class CepMatch(user_id: Long, event_ids: Seq[Long], start_us: Long, end_us: Long)

/** One event of a match together with the pattern step that bound it. */
case class BoundEv(step: String, ev: Ev)

/** A match with full step→event bindings (the MATCH_RECOGNIZE MEASURES
 * surface reads fields of bound events per step). */
case class CepBound(user_id: Long, start_us: Long, end_us: Long, binds: List[BoundEv])

/** Generic step→event binding (any event type `T`). */
case class BoundG[T](step: String, ev: T)

/** Generic batch match: event-time span plus step bindings. */
case class MatchG[T](start_us: Long, end_us: Long, binds: List[BoundG[T]])

/** Generic streaming match: the (stringified) partition key plus the
 * match span and bindings. Downstream projections read the typed key
 * back out of `binds.head.ev`, so the string form never leaks into
 * results. */
case class CepBoundG[T](key: String, start_us: Long, end_us: Long, binds: List[BoundG[T]])

/** Buffered per-key state: events still inside the pattern's `within`
 * horizon (ts-ordered on use) plus (start_ts, start_sig) of matches
 * already emitted — both pruned on watermark advance. `matchedIds`
 * (ids of still-buffered events that participated in an emitted match)
 * is tracked only when unmatched-row emission is on. */
case class CepStateG[T](buffer: List[T], emitted: List[(Long, Long)],
    matchedIds: List[Long] = Nil,
    // Cross-batch skip floor (SkipPastLast/SkipToFirst/SkipToLast):
    // "the next match must start at an event with (ts, id) at least /
    // strictly after this". Eviction can remove an emitted match's
    // start while later events survive; without the floor the re-scan
    // would surface a sub-match the skip had shadowed (per-start dedup
    // cannot catch it — the shadowed start is a different event).
    floorTs: Long = Long.MinValue, floorId: Long = Long.MinValue,
    floorStrict: Boolean = false,
    // Open incremental runs for eligible (all-Once) patterns — the
    // analog of the reference NFA's computation states
    // (`cep/nfa/NFA.java:86` advances these per event instead of
    // re-deriving them): (start event id, next step index, bound event
    // ids in consumption order). Append-only batches RESUME these over
    // the new events only; an out-of-order batch re-derives them from
    // the merged buffer.
    runs: List[(Long, Int, List[Long])] = Nil)

/**
 * A linear CEP pattern over an arbitrary event type `T`: ordered steps,
 * each a predicate plus a contiguity mode, with an overall `within`
 * bound. Mirrors the reference pattern surface
 * `cep/pattern/Pattern.java:128-416` (`Pattern<T, F extends T>` —
 * generic over the event type — with
 * `begin/next/followedBy/within`) on a deterministic-NFA subset.
 *
 * {{{
 * Cep.Pattern.begin("click", _.event_type == "click")   // Ev fixture
 *   .next("buy", _.event_type == "purchase")      // strictly adjacent
 *   .followedBy("ship", _.event_type == "ship")   // relaxed contiguity
 *   .within(10.minutes → micros)
 *
 * Cep.Pattern.of[Order]("placed", _.o_orderstatus == "O")  // any type
 *   .followedBy("filled", _.o_orderstatus == "F")
 * }}}
 */
object Cep {

  sealed trait Quant
  case object Once extends Quant
  /** Greedy include-first, skip on downstream failure. */
  case object Optional extends Quant
  /** Reluctant optional: skip-first, include only on downstream
   * failure (reference `Quantifier.optional` with
   * `ConsumingStrategy`/greedy flag off). */
  case object OptionalReluctant extends Quant
  /** Strict-contiguity maximal run, no backtracking (documented subset
   * of the reference's greedy oneOrMore). */
  case object OneOrMore extends Quant
  /** Reluctant oneOrMore: minimal strict run (≥1), extended only when
   * the remaining steps fail (reference `Pattern.oneOrMore` without
   * `greedy()`). */
  case object OneOrMoreReluctant extends Quant
  /** Reluctant oneOrMore with RELAXED inner contiguity — the
   * reference's default `Pattern.oneOrMore` mode (SKIP_TILL_NEXT
   * between repetitions): repetitions may skip non-matching events,
   * and the run extends only when the remaining steps fail. */
  case object OneOrMoreRelaxed extends Quant
  /** Greedy zero-or-more — SQL row-pattern `B*` (reference
   * `Quantifier.looping` + `optional`, i.e. `oneOrMore().optional()`
   * in the fluent API): the maximal strict run is preferred, and a
   * failing continuation backtracks to shorter runs down to the empty
   * run. */
  case object ZeroOrMore extends Quant
  /** Reluctant zero-or-more (`B*?`): try the remaining steps with an
   * empty run first, extend one strict repetition at a time only on
   * downstream failure. */
  case object ZeroOrMoreReluctant extends Quant
  /** Looping with SKIP_TILL_ANY inner contiguity (reference
   * `Pattern.allowCombinations()`, `Pattern.java:437` via
   * `Quantifier.combinations()`): after each consumed repetition the
   * continuation may proceed, and every later qualifying row is also
   * its own take-branch — all in-order sub-sequences of qualifying
   * rows become distinct match branches, emitted like [[Any]]. The
   * reference doc's `A1 A2 B` example yields `A1 B`, `A2 B`,
   * `A1 A2 B` across start anchors. */
  case object OneOrMoreCombinations extends Quant
  /** Negative lookahead on the next event (not consumed). */
  case object NotNext extends Quant
  /** Relaxed contiguity with ALL alternatives (reference
   * `Pattern.followedByAny`): every qualifying later event is a
   * branch, so one start can yield several matches. */
  case object Any extends Quant
  /** Negative relaxed step (reference `Pattern.notFollowedBy`): no
   * qualifying event may occur before the next consumed event (or, at
   * pattern end, anywhere in the `within` window — which then gates
   * emission on window close). Not consumed. */
  case object NotFollowed extends Quant

  /** After-match skip strategy (reference
   * `cep/nfa/aftermatch/AfterMatchSkipStrategy.java` + its five
   * subclasses): where the scan resumes after a match is emitted. */
  sealed trait AfterMatch
  /** Every qualifying event starts its own match (overlaps allowed). */
  case object NoSkip extends AfterMatch
  /** One match per start event; in this engine's deterministic
   * earliest-match subset each start yields at most one match, so
   * SKIP_TO_NEXT coincides with NO_SKIP (documented). */
  case object SkipToNext extends AfterMatch
  /** Resume after the last event of the emitted match
   * (`SkipPastLastStrategy`): non-overlapping matches. */
  case object SkipPastLast extends AfterMatch
  /** Resume at the FIRST event bound to `step` in the emitted match
   * (`SkipToFirstStrategy`; never stalls: advances at least one). */
  final case class SkipToFirst(step: String) extends AfterMatch
  /** Resume at the LAST event bound to `step` in the emitted match
   * (`SkipToLastStrategy`). */
  final case class SkipToLast(step: String) extends AfterMatch

  /** Context visible to an iterative condition (reference
   * `cep/pattern/conditions/IterativeCondition.java:59`
   * `Context.getEventsForPattern`, plus MATCH_RECOGNIZE's PREV
   * navigation): the events already bound to earlier (or looping)
   * steps of the CURRENT partial match, and the rows physically
   * preceding the candidate in the key's time-ordered stream. */
  trait MatchCtx[T] {
    /** Events bound so far to `step`, in consumption order
     * (times-expanded `step#k` names match by prefix). */
    def eventsFor(step: String): Seq[T]
    /** The row `offset` >= 1 positions before the candidate row in the
     * key's time-ordered stream (MATCH_RECOGNIZE `PREV`): None before
     * the start of the retained buffer. In streaming, history older
     * than `watermark - within` is evicted, so an in-horizon
     * candidate's prev(k) DEGRADES TO None once it would reach below
     * that boundary — a prev-using predicate evaluated near the
     * horizon can therefore depend on which micro-batch first sees the
     * candidate (documented batch-timing sensitivity; keep prev
     * offsets small relative to the within window). */
    def prev(offset: Int): Option[T]
  }

  /** A step condition: the candidate event plus the partial-match
   * context (simple conditions ignore the context). */
  type IterPred[T] = (T, MatchCtx[T]) => Boolean

  /** A context-blind condition (every non-`Iter` combinator): marked by
   * class so the matcher can skip building a MatchCtx per evaluation —
   * the scan loops evaluate predicates O(n²)-ish times per key. */
  private final class CtxFreePred[T](f: T => Boolean)
      extends ((T, MatchCtx[T]) => Boolean) with Serializable {
    def apply(e: T, ctx: MatchCtx[T]): Boolean = f(e)
  }

  private def ctxFree(p: (_, _) => Boolean): Boolean = p.isInstanceOf[CtxFreePred[_]]

  /** Shared no-op context passed to context-blind predicates. */
  private object EmptyCtx extends MatchCtx[Any] {
    def eventsFor(step: String): Seq[Any] = Nil
    def prev(offset: Int): Option[Any] = None
  }

  private def lift[T](pred: T => Boolean): IterPred[T] = new CtxFreePred(pred)

  private def liftSub[T, S <: T](pred: S => Boolean)(
      implicit ct: scala.reflect.ClassTag[S]): IterPred[T] = new CtxFreePred({
    case s: S => pred(s)
    case _ => false
  })

  final case class Step[T](name: String, pred: IterPred[T], strict: Boolean,
      quant: Quant = Once, until: Option[IterPred[T]] = None,
      alts: Seq[(String, IterPred[T])] = Nil)

  final case class Pattern[T](steps: Vector[Step[T]], withinUs: Long = Long.MaxValue,
      skip: AfterMatch = NoSkip, stepGapUs: Long = Long.MaxValue,
      holdToHorizon: Boolean = false) {
    /** Opt-in EXACT-preference streaming emission: hold every match
     * until the watermark closes its within window, so the emitted
     * match is the preference over the COMPLETE horizon — identical
     * to the batch matcher even when a relaxed/greedy quantifier
     * could otherwise have grown past an early completion (default
     * emission commits to the preferred match as of the completing
     * batch). Costs `within` of latency; requires within(). */
    def emitOnHorizon(): Pattern[T] = copy(holdToHorizon = true)
    def next(name: String, pred: T => Boolean): Pattern[T] =
      copy(steps = steps :+ Step(name, lift(pred), strict = true))
    def followedBy(name: String, pred: T => Boolean): Pattern[T] =
      copy(steps = steps :+ Step(name, lift(pred), strict = false))
    /** Strict step with an ITERATIVE condition — the predicate also
     * sees the events bound to earlier steps of the partial match and
     * PREV rows (reference `IterativeCondition`). */
    def nextIter(name: String, pred: IterPred[T]): Pattern[T] =
      copy(steps = steps :+ Step(name, pred, strict = true))
    /** Relaxed step with an ITERATIVE condition. */
    def followedByIter(name: String, pred: IterPred[T]): Pattern[T] =
      copy(steps = steps :+ Step(name, pred, strict = false))
    /** Strict step matching only events of SUBTYPE `S` (reference
     * `Pattern.subtype`, `Pattern.java:196` — there `subtype()` narrows
     * the current step's condition; here the narrowed step is appended
     * with the chosen contiguity): a non-`S` event fails the step. */
    def nextSubtype[S <: T : scala.reflect.ClassTag](name: String, pred: S => Boolean): Pattern[T] =
      copy(steps = steps :+ Step(name, liftSub(pred), strict = true))
    /** Relaxed step matching only events of SUBTYPE `S`. */
    def followedBySubtype[S <: T : scala.reflect.ClassTag](name: String, pred: S => Boolean): Pattern[T] =
      copy(steps = steps :+ Step(name, liftSub(pred), strict = false))
    /** Relaxed-reluctant oneOrMore over events of SUBTYPE `S`
     * (reference `Pattern.oneOrMore` after `subtype()`). */
    def oneOrMoreSubtype[S <: T : scala.reflect.ClassTag](name: String, pred: S => Boolean): Pattern[T] =
      copy(steps = steps :+ Step(name, liftSub(pred), strict = false, quant = OneOrMoreRelaxed))
    /** Relaxed-reluctant oneOrMore with an ITERATIVE condition — each
     * repetition sees the repetitions already consumed. */
    def oneOrMoreIter(name: String, pred: IterPred[T]): Pattern[T] =
      copy(steps = steps :+ Step(name, pred, strict = false, quant = OneOrMoreRelaxed))
    /** n occurrences with relaxed contiguity (expands to n steps —
     * reference `Pattern.times`). */
    def times(name: String, pred: T => Boolean, n: Int): Pattern[T] =
      (1 to n).foldLeft(this)((p, i) => p.followedBy(s"$name#$i", pred))
    /** Between `min` and `max` occurrences, relaxed contiguity
     * (reference `Pattern.times(from, to)`): `min` required steps then
     * `max - min` greedy-optional ones, include-first like `optional`. */
    def timesRange(name: String, pred: T => Boolean, min: Int, max: Int): Pattern[T] = {
      require(min >= 1 && max >= min, "need 1 <= min <= max")
      val withMin = (1 to min).foldLeft(this)((p, i) => p.followedBy(s"$name#$i", pred))
      (min + 1 to max).foldLeft(withMin)((p, i) => p.optional(s"$name#$i", pred))
    }
    /** `n` or more occurrences, relaxed contiguity (reference
     * `Pattern.timesOrMore`): `n - 1` required steps then a
     * relaxed-reluctant oneOrMore tail — the same expansion the
     * MATCH_RECOGNIZE `{n,}` quantifier compiles to. */
    def timesOrMore(name: String, pred: T => Boolean, n: Int): Pattern[T] = {
      require(n >= 1, "need n >= 1")
      (1 until n).foldLeft(this)((p, i) => p.followedBy(s"$name#$i", pred))
        .oneOrMore(s"$name#$n", pred)
    }
    /** One or more occurrences, RELAXED inner contiguity, reluctant —
     * the reference's default `Pattern.oneOrMore` (SKIP_TILL_NEXT
     * between repetitions, minimal consumption). */
    def oneOrMore(name: String, pred: T => Boolean): Pattern[T] =
      copy(steps = steps :+ Step(name, lift(pred), strict = false, quant = OneOrMoreRelaxed))
    /** Optional relaxed step (reference `Pattern.optional`). */
    def optional(name: String, pred: T => Boolean): Pattern[T] =
      copy(steps = steps :+ Step(name, lift(pred), strict = false, quant = Optional))
    /** Optional STRICT step: included only if the immediately next
     * event qualifies (MATCH_RECOGNIZE `X?` contiguity). */
    def optionalNext(name: String, pred: T => Boolean): Pattern[T] =
      copy(steps = steps :+ Step(name, lift(pred), strict = true, quant = Optional))
    /** Reluctant optional: excluded unless the rest of the pattern
     * cannot match without it. */
    def optionalReluctant(name: String, pred: T => Boolean): Pattern[T] =
      copy(steps = steps :+ Step(name, lift(pred), strict = false, quant = OptionalReluctant))
    /** Greedy maximal consecutive run, >= 1 (reference
     * `Pattern.oneOrMore` with strict inner contiguity). */
    def oneOrMoreNext(name: String, pred: T => Boolean): Pattern[T] =
      copy(steps = steps :+ Step(name, lift(pred), strict = true, quant = OneOrMore))
    /** Reluctant consecutive run, >= 1: consumes as few events as the
     * rest of the pattern allows. */
    def oneOrMoreNextReluctant(name: String, pred: T => Boolean): Pattern[T] =
      copy(steps = steps :+ Step(name, lift(pred), strict = true, quant = OneOrMoreReluctant))
    /** Greedy maximal consecutive run, >= 0 (SQL `B*`; the reference
     * spells it `oneOrMore().optional()`). */
    def zeroOrMoreNext(name: String, pred: T => Boolean): Pattern[T] =
      copy(steps = steps :+ Step(name, lift(pred), strict = true, quant = ZeroOrMore))
    /** Reluctant consecutive run, >= 0 (SQL `B*?`): empty first,
     * extended only when the remaining steps fail. */
    def zeroOrMoreNextReluctant(name: String, pred: T => Boolean): Pattern[T] =
      copy(steps = steps :+ Step(name, lift(pred), strict = true, quant = ZeroOrMoreReluctant))
    /** Append a step with an explicit quantifier and an ITERATIVE
     * condition — the generic constructor the MATCH_RECOGNIZE surface
     * compiles onto (every named combinator is a special case). */
    def stepIter(name: String, pred: IterPred[T], strict: Boolean,
        quant: Quant = Once): Pattern[T] =
      copy(steps = steps :+ Step(name, pred, strict, quant))
    /** After-match skip strategy (reference `Pattern.begin(name,
     * afterMatchSkipStrategy)`). */
    def afterMatchSkip(s: AfterMatch): Pattern[T] = copy(skip = s)
    /** Negative strict step (reference `Pattern.notNext`): the match
     * continues only if the NEXT event does NOT satisfy `pred`; the
     * event is not consumed. Requires `within` in this engine (see
     * `notFollowedBy`). */
    def notNext(name: String, pred: T => Boolean): Pattern[T] =
      copy(steps = steps :+ Step(name, lift(pred), strict = true, quant = NotNext))
    /** Relaxed step matching EVERY qualifying later event, not just
     * the earliest (reference `Pattern.followedByAny`): one start can
     * emit several matches, deduplicated by full match signature.
     * Only NoSkip/SkipToNext compose with Any branches. */
    def followedByAny(name: String, pred: T => Boolean): Pattern[T] =
      copy(steps = steps :+ Step(name, lift(pred), strict = false, quant = Any))
    /** Negative relaxed step (reference `Pattern.notFollowedBy`): no
     * qualifying event between the previous consumed event and the
     * next consumed one. This engine requires `within` on ANY pattern
     * containing a negative step (the reference only rejects a
     * trailing notFollowedBy without within) and holds such matches
     * until the watermark closes the window — with per-micro-batch
     * re-evaluation, absence is only provable then. */
    def notFollowedBy(name: String, pred: T => Boolean): Pattern[T] =
      copy(steps = steps :+ Step(name, lift(pred), strict = false, quant = NotFollowed))
    /** Stop condition for the LAST step, which must be a looping
     * (oneOrMore-family) step (reference `Pattern.until`,
     * `Pattern.java:219`): the loop stops accepting repetitions as
     * soon as a row satisfying `stop` is reached — the stopping row is
     * not consumed, and a loop that hits the stop row before its first
     * repetition fails (>= 1 not met). */
    def until(stop: T => Boolean): Pattern[T] = untilIter(lift(stop))
    /** `until` with an iterative stop condition. */
    def untilIter(stop: IterPred[T]): Pattern[T] = {
      require(steps.nonEmpty && isLooping(steps.last.quant),
        "until() applies to a oneOrMore-family step")
      copy(steps = steps.init :+ steps.last.copy(until = Some(stop)))
    }
    /** Reference `Pattern.allowCombinations()` (`Pattern.java:437`):
     * switch the LAST step — which must be a one-or-more variant — to
     * SKIP_TILL_ANY inner contiguity, so every in-order sub-sequence
     * of qualifying rows is its own match branch (vs the contiguous
     * prefixes/runs of the default modes). Inherently multiplicative,
     * as in the reference: a selective loop condition is what bounds
     * the branch count. */
    def allowCombinations(): Pattern[T] = {
      require(steps.nonEmpty && Set[Quant](OneOrMore, OneOrMoreReluctant,
          OneOrMoreRelaxed)(steps.last.quant),
        "allowCombinations() applies to a oneOrMore-family step")
      require(steps.last.alts.isEmpty,
        "allowCombinations() does not compose with alternation groups")
      copy(steps = steps.init :+ steps.last.copy(quant = OneOrMoreCombinations))
    }
    /** ALTERNATION step, strict contiguity: the next event must
     * satisfy at least one alternative's condition and binds under the
     * FIRST qualifying alternative's name, in declared order — SQL
     * MATCH_RECOGNIZE `(A | B)` preference (reference pattern grammar,
     * `flink-sql-parser` codegen + `StreamExecMatch.java:90`; the
     * reference NFA branches states, this engine resolves the branch
     * at the single consumed row — the deterministic subset). Only
     * unquantified alternation is supported. */
    def nextAlt(alternatives: Seq[(String, IterPred[T])]): Pattern[T] =
      altStep(alternatives, strictStep = true)
    /** ALTERNATION step with relaxed contiguity (earliest event
     * satisfying ANY alternative). */
    def followedByAlt(alternatives: Seq[(String, IterPred[T])]): Pattern[T] =
      altStep(alternatives, strictStep = false)
    private def altStep(alternatives: Seq[(String, IterPred[T])],
        strictStep: Boolean): Pattern[T] = {
      require(alternatives.nonEmpty, "empty alternation")
      val orPred: IterPred[T] = (e, ctx) => alternatives.exists(_._2(e, ctx))
      copy(steps = steps :+ Step(alternatives.map(_._1).mkString("|"), orPred,
        strictStep, Once, None, alternatives))
    }
    /** QUANTIFIED alternation group — `(A | B)+`, `(A | B)?`,
     * `(A | B)*` and the reluctant forms (reference pattern grammar
     * allows quantifiers on groups): one step whose run/optional
     * consumption accepts rows satisfying ANY alternative, each
     * consumed row binding under the first alternative it satisfies. */
    def nextAltQuant(alternatives: Seq[(String, IterPred[T])], quant: Quant): Pattern[T] = {
      require(alternatives.nonEmpty, "empty alternation")
      val orPred: IterPred[T] = (e, ctx) => alternatives.exists(_._2(e, ctx))
      copy(steps = steps :+ Step(alternatives.map(_._1).mkString("|"), orPred,
        strict = true, quant, None, alternatives))
    }
    /** PERMUTE group, strict contiguity (SQL:2016 row-pattern
     * PERMUTE; the reference sql-parser grammar expands
     * `PERMUTE(A, B)` to the alternation `((A B) | (B A))` in
     * lexicographic order): appends one alternation step per
     * variable, every alternative guarded to bind AT MOST ONCE per
     * match (`ctx.eventsFor(name).isEmpty`). The matcher's lazy
     * per-alternative branching then enumerates exactly the
     * permutations of the variables over the next `n` contiguous
     * rows, preferring earlier-listed variables at each position —
     * the reference's expansion order. */
    def nextPermute(vars: Seq[(String, IterPred[T])]): Pattern[T] = {
      require(vars.size >= 2, "PERMUTE needs at least two variables")
      val guarded = vars.map { case (n, pr) =>
        val g: IterPred[T] = (e, ctx) => ctx.eventsFor(n).isEmpty && pr(e, ctx)
        n -> g
      }
      vars.indices.foldLeft(this)((p, _) => p.altStep(guarded, strictStep = true))
    }
    /** Append a GROUP pattern with relaxed contiguity (reference
     * `GroupPattern.java:30`, `Pattern.followedBy(Pattern)`): the
     * group's steps splice into this pattern; the group's first step
     * adopts relaxed contiguity toward the preceding event. The group
     * must not set its own within/skip (the outer pattern's apply). */
    def followedByGroup(group: Pattern[T]): Pattern[T] = splice(group, strictHead = false)
    /** Append a GROUP pattern with strict contiguity (reference
     * `Pattern.next(Pattern)`). */
    def nextGroup(group: Pattern[T]): Pattern[T] = splice(group, strictHead = true)
    /** n repetitions of a GROUP pattern, relaxed between repetitions
     * (reference `Pattern.followedBy(group).times(n)`): inner step
     * names get `#k` suffixes per repetition so bindings stay
     * addressable. */
    def timesGroup(group: Pattern[T], n: Int): Pattern[T] = {
      require(n >= 1, "need n >= 1")
      (1 to n).foldLeft(this)((p, k) =>
        p.splice(group.copy(steps = group.steps.map(s =>
          s.copy(name = s"${s.name}#$k"))), strictHead = false))
    }
    private def splice(group: Pattern[T], strictHead: Boolean): Pattern[T] = {
      require(group.steps.nonEmpty, "empty group pattern")
      require(group.withinUs == Long.MaxValue && group.skip == NoSkip &&
          group.stepGapUs == Long.MaxValue,
        "group patterns may not carry within()/afterMatchSkip (set them on the outer pattern)")
      require(group.steps.head.quant == Once,
        "a group's first step must be unquantified (its contiguity comes from the outer combinator)")
      val head = group.steps.head.copy(strict = strictHead)
      copy(steps = steps ++ (head +: group.steps.tail))
    }
    def within(us: Long): Pattern[T] = copy(withinUs = us)
    /** PER-STEP time gap (reference `Pattern.within(duration,
     * WithinType.PREVIOUS_AND_CURRENT)`, `Pattern.java:245`): every
     * pair of CONSECUTIVELY CONSUMED events in a match must be at most
     * `us` apart — vs [[within]], which bounds the whole match span.
     * Negative (notNext/notFollowedBy) slots are not gap-constrained.
     * Requires [[within]] too (state eviction is keyed off the overall
     * horizon). */
    def withinStep(us: Long): Pattern[T] = copy(stepGapUs = us)
  }

  private def isLooping(q: Quant): Boolean =
    q == OneOrMore || q == OneOrMoreReluctant || q == OneOrMoreRelaxed ||
      q == ZeroOrMore || q == ZeroOrMoreReluctant || q == OneOrMoreCombinations

  object Pattern {
    /** Generic entry over any event type (reference
     * `Pattern.<T>begin`); the explicit type argument gives the
     * predicate lambda its parameter type. */
    def of[T](name: String, pred: T => Boolean): Pattern[T] =
      Pattern(Vector(Step(name, lift(pred), strict = false)))
    /** Ev-fixture shorthand (the original entry; keeps the predicate
     * lambdas inferring without a type argument). */
    def begin(name: String, pred: Ev => Boolean): Pattern[Ev] = of[Ev](name, pred)
  }

  /** Match the pattern over one key's ts-ordered event list (Ev
   * fixture shim over [[matchSortedG]]). */
  private[streaming] def matchSorted(events: IndexedSeq[Ev], p: Pattern[Ev]): List[CepMatch] =
    matchSortedBound(events, p).map(b =>
      CepMatch(b.user_id, b.binds.map(_.ev.event_id), b.start_us, b.end_us))

  private[graft] def matchSortedBound(events: IndexedSeq[Ev], p: Pattern[Ev]): List[CepBound] =
    matchSortedG[Ev](events, p, _.ts_us, _.event_id).map(m =>
      CepBound(m.binds.head.ev.user_id, m.start_us, m.end_us,
        m.binds.map(b => BoundEv(b.step, b.ev))))

  /** Match the pattern over one key's time-ordered event list.
   *
   * Semantics (deterministic subset of the reference NFA,
   * `cep/nfa/NFA.java:86`): a match may begin at every row the
   * after-match skip strategy has not skipped past and whose first
   * predicate holds; each subsequent step consumes the FIRST
   * qualifying later event (earliest-match greediness) unless its
   * quantifier says otherwise; `next` requires strict adjacency in the
   * ordered stream, `followedBy` allows gaps; the whole match must
   * span at most `withinUs` microseconds. `time` reads the event-time
   * (epoch micros) of an event; `id` a unique Long used for
   * deterministic tie-breaks and match signatures. */
  private[graft] def matchSortedG[T](events: IndexedSeq[T], p: Pattern[T],
      time: T => Long, id: T => Long): List[MatchG[T]] = {

    def inWindow(start: T, j: Int): Boolean =
      j < events.length && time(events(j)) - time(start) <= p.withinUs

    // per-step gap (withinStep): candidate j measured against the
    // previously CONSUMED event's position; the head step has no
    // predecessor (prev < 0), so no gap constrains it
    def gapOk(prev: Int, j: Int): Boolean =
      p.stepGapUs == Long.MaxValue || prev < 0 ||
        (j < events.length && time(events(j)) - time(events(prev)) <= p.stepGapUs)

    /** Iterative-condition context for the candidate at index `cand`
     * given the bindings accumulated so far: the context sees only the
     * CURRENT partial match (reference `IterativeCondition.java:59`),
     * and `prev` walks the physical time-ordered buffer
     * (MATCH_RECOGNIZE `PREV`). */
    def ctxAt(binds: Vector[(String, Int)], cand: Int): MatchCtx[T] = new MatchCtx[T] {
      def eventsFor(step: String): Seq[T] = binds.collect {
        case (n, j) if n == step || n.startsWith(step + "#") => events(j)
      }
      def prev(offset: Int): Option[T] =
        if (offset >= 1 && cand - offset >= 0) Some(events(cand - offset)) else None
    }

    /** Enumerate matches of `steps` with the previous consumed index
     * at `pos`, lazily, in deterministic preference order; `acc`
     * carries (step name, event index) bindings in consumption order
     * — the skip strategies address events by the step that bound
     * them (reference SharedBuffer's per-state event paths). Callers
     * take the head for the earliest-match subset, or every
     * alternative when the pattern contains a `followedByAny` step. */
    def matchSteps(start: T, pos: Int, steps: List[Step[T]],
        acc: Vector[(String, Int)]): LazyList[(Int, Vector[(String, Int)])] = steps match {
      case Nil => LazyList((pos, acc))
      case st :: rest =>
        val noCtx = EmptyCtx.asInstanceOf[MatchCtx[T]]
        val predFree = ctxFree(st.pred)
        val untilFree = st.until.forall(ctxFree)
        def ok(binds: Vector[(String, Int)], j: Int): Boolean =
          st.pred(events(j), if (predFree) noCtx else ctxAt(binds, j))
        // until() stop condition (reference `Pattern.java:219`): the
        // loop stops accepting repetitions at the first row satisfying
        // it; the stop row is not consumed, and a stop row before the
        // first repetition fails the loop (>= 1 not met).
        def stopAt(binds: Vector[(String, Int)], j: Int): Boolean =
          st.until.exists(u => u(events(j), if (untilFree) noCtx else ctxAt(binds, j)))
        // alternation: one lazy branch per alternative the consumed
        // row satisfies, in declared order — the head of the overall
        // LazyList still prefers the FIRST alternative (SQL (A | B)
        // preference), but a branch whose CONTINUATION fails falls
        // back to the next alternative instead of killing the match.
        // PERMUTE compiles to alternatives guarded on "not yet bound
        // in this match" (nextPermute), which needs exactly this
        // backtracking to enumerate permutations.
        def withEventAt(j: Int): LazyList[(Int, Vector[(String, Int)])] =
          if (st.alts.isEmpty) matchSteps(start, j, rest, acc :+ ((st.name, j)))
          else LazyList.from(st.alts)
            .collect { case (n, pr) if pr(events(j), ctxAt(acc, j)) => n }
            .flatMap(n => matchSteps(start, j, rest, acc :+ ((n, j))))
        // loop-step binding for QUANTIFIED alternation groups
        // ((A | B)+ etc.): each consumed repetition binds under the
        // first alternative it satisfies — declared-order preference
        // per row, no per-row alternative backtracking inside runs
        // (documented subset; the run membership itself is the OR)
        def bindAs(binds: Vector[(String, Int)], j: Int): String =
          if (st.alts.isEmpty) st.name
          else st.alts.find(_._2(events(j), ctxAt(binds, j))).map(_._1).getOrElse(st.name)
        def firstQualifying(from: Int): Int = {
          var j = from
          while (inWindow(start, j) && gapOk(from - 1, j) && !ok(acc, j)) j += 1
          j
        }
        def reachable(j: Int): Boolean = inWindow(start, j) && gapOk(pos, j)
        st.quant match {
          case Once if st.strict =>
            val j = pos + 1
            if (reachable(j) && ok(acc, j)) withEventAt(j) else LazyList.empty
          case Once => // relaxed: earliest qualifying event
            val j = firstQualifying(pos + 1)
            if (reachable(j)) withEventAt(j) else LazyList.empty
          case Any => // relaxed: EVERY qualifying later event is a branch
            LazyList.from(pos + 1)
              .takeWhile(j => reachable(j))
              .filter(j => ok(acc, j))
              .flatMap(withEventAt)
          case Optional => // greedy include-first, fall back to skipping
            val included =
              if (st.strict) { // MATCH_RECOGNIZE contiguity: next event only
                val j = pos + 1
                if (reachable(j) && ok(acc, j)) withEventAt(j) else LazyList.empty
              } else {
                val j = firstQualifying(pos + 1)
                if (reachable(j)) withEventAt(j) else LazyList.empty
              }
            included #::: matchSteps(start, pos, rest, acc)
          case OptionalReluctant => // skip-first, include on failure
            matchSteps(start, pos, rest, acc) #::: {
              if (st.strict) { // MATCH_RECOGNIZE contiguity: next event only
                val j = pos + 1
                if (reachable(j) && ok(acc, j)) withEventAt(j) else LazyList.empty
              } else {
                val j = firstQualifying(pos + 1)
                if (reachable(j)) withEventAt(j) else LazyList.empty
              }
            }
          case NotNext => // negative lookahead; end-of-buffer satisfies
            // it — safe in streaming because the caller holds negated
            // matches until the watermark closes the within window, at
            // which point no event can still land in the adjacency slot
            val j = pos + 1
            if (inWindow(start, j) && ok(acc, j)) LazyList.empty
            else matchSteps(start, pos, rest, acc)
          case NotFollowed =>
            // forbid qualifying events between pos and each
            // alternative's next consumed event (or the window end
            // when the pattern ends here — emission is then gated on
            // window close by the caller)
            matchSteps(start, pos, rest, acc).filter { case (_, binds) =>
              val boundary =
                if (binds.length > acc.length) binds(acc.length)._2
                else { var j = pos + 1; while (inWindow(start, j)) j += 1; j }
              !((pos + 1) until boundary).exists(j => ok(acc, j))
            }
          case OneOrMore => // greedy WITH backtracking, minimum one:
            // the longest strict run is preferred, but a failing
            // continuation falls back rep by rep (never to empty) —
            // without this, `B+ C` would lose valid matches whenever
            // B's and C's conditions overlap (regex `+` semantics,
            // same rationale as ZeroOrMore below)
            var snaps: List[(Int, Vector[(String, Int)])] = Nil
            var j = pos + 1
            var binds = acc
            while (inWindow(start, j) && gapOk(j - 1, j) && !stopAt(binds, j) && ok(binds, j)) {
              binds :+= ((bindAs(binds, j), j)); snaps ::= ((j, binds)); j += 1
            }
            LazyList.from(snaps).flatMap { case (p0, b) =>
              matchSteps(start, p0, rest, b)
            }
          case ZeroOrMore => // greedy WITH backtracking: the longest
            // strict run is preferred, but a failing continuation
            // falls back to shorter runs and finally the EMPTY run —
            // without this, `A B* C` would lose the valid empty-B
            // match whenever B's and C's conditions overlap
            var snaps: List[(Int, Vector[(String, Int)])] = List((pos, acc))
            var j = pos + 1
            var binds = acc
            while (inWindow(start, j) && gapOk(j - 1, j) && !stopAt(binds, j) && ok(binds, j)) {
              binds :+= ((bindAs(binds, j), j)); snaps ::= ((j, binds)); j += 1
            }
            LazyList.from(snaps).flatMap { case (p0, b) =>
              matchSteps(start, p0, rest, b)
            }
          case OneOrMoreReluctant => // minimal strict run, extend on failure
            def runs(j: Int, binds: Vector[(String, Int)]): LazyList[(Int, Vector[(String, Int)])] =
              if (!inWindow(start, j) || !gapOk(j - 1, j) || stopAt(binds, j) || !ok(binds, j)) LazyList.empty
              else {
                val b = binds :+ ((bindAs(binds, j), j))
                matchSteps(start, j, rest, b) #::: runs(j + 1, b)
              }
            runs(pos + 1, acc)
          case ZeroOrMoreReluctant => // empty-first, extend on failure
            def runs0(j: Int, binds: Vector[(String, Int)]): LazyList[(Int, Vector[(String, Int)])] =
              if (!inWindow(start, j) || !gapOk(j - 1, j) || stopAt(binds, j) || !ok(binds, j)) LazyList.empty
              else {
                val b = binds :+ ((bindAs(binds, j), j))
                matchSteps(start, j, rest, b) #::: runs0(j + 1, b)
              }
            matchSteps(start, pos, rest, acc) #::: runs0(pos + 1, acc)
          case OneOrMoreCombinations =>
            // reference Quantifier.combinations() (SKIP_TILL_ANY inner
            // contiguity): after each consumed repetition the
            // continuation may proceed, and every later qualifying row
            // is also its own take-branch — all in-order sub-sequences
            // of qualifying rows, each a distinct branch (emitted like
            // Any). A stop row (until) ends the enumeration; the first
            // repetition follows the step's own contiguity (strict
            // adjacency for anchored heads, first-qualifying
            // otherwise).
            def combos(last: Int, binds: Vector[(String, Int)]): LazyList[(Int, Vector[(String, Int)])] =
              matchSteps(start, last, rest, binds) #::: LazyList.from(last + 1)
                .takeWhile(j => inWindow(start, j) && !stopAt(binds, j))
                .filter(j => gapOk(last, j) && ok(binds, j))
                .flatMap(j => combos(j, binds :+ ((bindAs(binds, j), j))))
            val firstRep: LazyList[Int] =
              if (st.strict) {
                val j = pos + 1
                if (reachable(j) && !stopAt(acc, j) && ok(acc, j)) LazyList(j)
                else LazyList.empty
              } else {
                var k = pos + 1
                while (inWindow(start, k) && gapOk(pos, k) && !stopAt(acc, k) && !ok(acc, k)) k += 1
                if (inWindow(start, k) && gapOk(pos, k) && !stopAt(acc, k)) LazyList(k)
                else LazyList.empty
              }
            firstRep.flatMap(j => combos(j, acc :+ ((bindAs(acc, j), j))))
          case OneOrMoreRelaxed => // minimal relaxed run: each further
            // repetition jumps to the next qualifying event (gaps OK),
            // but a stop row reached first ends the loop unconsumed
            def relaxedRuns(from: Int, binds: Vector[(String, Int)]): LazyList[(Int, Vector[(String, Int)])] = {
              var k = from
              while (inWindow(start, k) && gapOk(from - 1, k) && !stopAt(binds, k) && !ok(binds, k)) k += 1
              if (!inWindow(start, k) || !gapOk(from - 1, k) || stopAt(binds, k)) LazyList.empty
              else {
                val b = binds :+ ((st.name, k))
                matchSteps(start, k, rest, b) #::: relaxedRuns(k + 1, b)
              }
            }
            relaxedRuns(pos + 1, acc)
        }
    }

    validate(p) // direct batch callers (specs) get the same checks
    val hasAny = p.steps.exists(s =>
      s.quant == Any || s.quant == OneOrMoreCombinations)
    val headStep = p.steps.head
    val out = List.newBuilder[MatchG[T]]
    var i = 0
    while (i < events.length) {
      val start = events(i)
      var next = i + 1
      val alts: LazyList[(Int, Vector[(String, Int)])] =
        if (headStep.quant != Once) {
          // QUANTIFIED head (MATCH_RECOGNIZE `A+ …`, `A? …`, `A* …`):
          // the whole pattern runs through the step matcher anchored
          // at i — strict steps bind from i upward, a possibly-empty
          // head run falls through to the next step still at i. A
          // branch that consumed nothing is not a match (the
          // empty-match rejection in validate() guarantees at least
          // one step is required, so this filter is belt-and-braces).
          matchSteps(start, i - 1, p.steps.toList, Vector.empty).filter(_._2.nonEmpty)
        } else if (p.steps.head.pred(start,
            if (ctxFree(p.steps.head.pred)) EmptyCtx.asInstanceOf[MatchCtx[T]]
            else ctxAt(Vector.empty, i))) {
          // same per-alternative branching as matchSteps for the head:
          // each satisfying alternative (declared order) is a branch
          val headNames: LazyList[String] =
            if (headStep.alts.isEmpty) LazyList(headStep.name)
            else LazyList.from(headStep.alts)
              .collect { case (n, pr) if pr(start, ctxAt(Vector.empty, i)) => n }
          headNames.flatMap(hn =>
            matchSteps(start, i, p.steps.tail.toList, Vector((hn, i))))
        } else LazyList.empty
      locally {
        // earliest-match subset takes the preferred alternative; Any
        // patterns emit every distinct branch (reference followedByAny)
        val ms = if (hasAny) alts.toList.distinct else alts.headOption.toList
        ms.foreach { case (endPos, binds) =>
          out += MatchG(time(start), time(events(endPos)),
            binds.map { case (n, j) => BoundG(n, events(j)) }.toList)
          // `times` expands names to "name#k": match on the prefix
          def bound(step: String) = binds.filter(_._1.takeWhile(_ != '#') == step)
          p.skip match {
            case NoSkip | SkipToNext => ()
            case SkipPastLast => next = endPos + 1
            case SkipToFirst(s) =>
              bound(s).headOption.foreach { case (_, j) => next = math.max(j, i + 1) }
            case SkipToLast(s) =>
              bound(s).lastOption.foreach { case (_, j) => next = math.max(j, i + 1) }
          }
        }
      }
      i = next
    }
    out.result()
  }

  /**
   * Run the pattern per user over the Ev fixture stream — shim over
   * the generic [[runBoundBy]] (key `user_id`, time `ts_us`, id
   * `event_id`). */
  def run(ds: Dataset[Ev], pattern: Pattern[Ev],
      watermarkDelay: String = "1 hour"): Dataset[CepMatch] = {
    import ds.sparkSession.implicits._
    runBound(ds, pattern, watermarkDelay).map(b =>
      CepMatch(b.user_id, b.binds.map(_.ev.event_id), b.start_us, b.end_us))
  }

  /** Pattern-composition checks shared by the batch matcher and the
   * streaming entry — called HERE driver-side so a misconfigured
   * pattern fails fast at query construction, not as repeated
   * executor task failures mid-stream. */
  private[graft] def validate(p: Pattern[_]): Unit = {
    // Step names address bindings (eventsFor, skip strategies) by
    // '#'-prefix convention. Re-USING a name across steps is the
    // supported way to bind one variable in several steps (the b+ c
    // skip example), but a user-chosen name that itself looks like a
    // times/group expansion of a DIFFERENT step ("x#1" next to "x")
    // would silently alias that step's bindings — reject it.
    val names = p.steps.map(_.name)
    for (n <- names; h = n.indexOf('#'); if h >= 0) {
      require(n.drop(h + 1).forall(_.isDigit),
        s"step name '$n': '#' is reserved for the 'name#k' expansion convention")
      require(names.forall(m => m == n || !n.startsWith(m + "#")),
        s"step name '$n' aliases the bindings of step '${n.take(h)}'")
    }
    require(!p.steps.exists(s => s.quant == Any || s.quant == OneOrMoreCombinations) ||
        p.skip == NoSkip || p.skip == SkipToNext,
      "followedByAny/allowCombinations emit overlapping matches; " +
        "only NoSkip/SkipToNext compose with them")
    require(p.steps.forall(s => s.alts.isEmpty || Set[Quant](Once, Optional,
        OptionalReluctant, OneOrMore, OneOrMoreReluctant, ZeroOrMore,
        ZeroOrMoreReluctant)(s.quant)),
      "alternation composes with once/optional/strict-looping quantifiers only")
    require(p.stepGapUs == Long.MaxValue || p.withinUs != Long.MaxValue,
      "withinStep() requires within() (the overall horizon drives state eviction)")
    // ANY negative step — notFollowedBy anywhere, notNext anywhere —
    // asserts absence, which is only provable over a bounded window: a
    // gap/adjacency slot's falsifying event may arrive long after a
    // candidate match was found, and without a within() horizon the
    // emission hold below would be bypassed, letting a later event
    // falsify an already-emitted match. (Engine-specific restriction:
    // this engine re-evaluates per micro-batch, so it must know when a
    // negative assertion becomes immutable. The reference NFA only
    // rejects a TRAILING notFollowedBy without within; the mid-pattern
    // and notNext requirements here are ours.)
    require(!p.steps.exists(s => s.quant == NotFollowed || s.quant == NotNext) ||
        p.withinUs != Long.MaxValue,
      "a pattern containing notFollowedBy/notNext requires within() " +
        "(this engine holds negative-assertion matches until the watermark " +
        "closes the within window)")
    require(!p.holdToHorizon || p.withinUs != Long.MaxValue,
      "emitOnHorizon() requires within() (the closed window is what makes " +
        "the emitted preference final)")
    // Reference parity (StreamExecMatch.java:143-145 via
    // NFACompiler.canProduceEmptyMatches): a pattern in which EVERY
    // step can consume zero rows could match empty at any position —
    // rejected loudly, same as the reference.
    val possiblyEmpty: Set[Quant] = Set(Optional, OptionalReluctant,
      ZeroOrMore, ZeroOrMoreReluctant, NotNext, NotFollowed)
    require(p.steps.exists(s => !possiblyEmpty(s.quant)),
      "Patterns that can produce empty matches are not supported. " +
        "There must be at least one non-optional state.")
    // a quantified head is anchored per start row, which presumes
    // strict contiguity (the MATCH_RECOGNIZE compilation); relaxed
    // quantified heads would re-find one run from many anchors
    require(p.steps.head.quant == Once || p.steps.head.strict,
      "a quantified first step requires strict contiguity")
    require(p.steps.head.quant == Once || p.stepGapUs == Long.MaxValue,
      "withinStep() does not compose with a quantified first step " +
        "(the head's first binding has no predecessor to measure against)")
  }

  /** `run` with full step→event bindings preserved per match (Ev
   * fixture shim; the MATCH_RECOGNIZE MEASURES surface projects
   * fields out of the bindings). */
  def runBound(ds: Dataset[Ev], pattern: Pattern[Ev],
      watermarkDelay: String = "1 hour"): Dataset[CepBound] = {
    import ds.sparkSession.implicits._
    runBoundBy(ds, pattern, "user_id", "ts_us", "event_id", watermarkDelay)
      .map(b => CepBound(b.binds.head.ev.user_id, b.start_us, b.end_us,
        b.binds.map(x => BoundEv(x.step, x.ev))))
  }

  /**
   * Run the pattern per key over ANY case-class event stream
   * (flatMapGroupsWithState NFA, reference `operator/CepOperator.java:81`
   * — which is generic over the event type exactly like this entry).
   * `keyField`/`timeField`/`idField` name columns of `T`: the
   * partition key (any type; grouped by its string form, projected
   * back typed from the bindings), the event time (epoch-micros Long),
   * and a unique Long id (tie-breaks and dedup signatures). Each batch
   * re-evaluates over the buffered, time-sorted history and emits only
   * new matches — so matches that straddle micro-batch boundaries are
   * found, and no match is emitted twice. Dedup is per START EVENT in
   * the deterministic earliest-match subset (a late arrival that
   * changes an emitted start's preferred binding does not re-emit),
   * and per full binding signature for `followedByAny` patterns (which
   * legitimately emit several matches per start). Patterns containing
   * negative steps hold their matches until the watermark closes the
   * `within` window — a later batch could otherwise falsify the
   * asserted absence.
   *
   * State is bounded by the pattern's `within` horizon: after each
   * batch, buffer events (and emitted-match markers) with
   * `ts < watermark − withinUs` are evicted — no event that old can
   * participate in a match completed by a future (≥ watermark) event.
   * This is the reference NFA's SharedBuffer pruning on watermark
   * advance (`cep/nfa/sharedbuffer/SharedBuffer.java` via
   * `CepOperator.advanceTime`). Eviction runs AFTER matching, so
   * late-but-arrived rows at or above the horizon still pair with the
   * retained history; rows BELOW the horizon are dropped on entry (they
   * cannot extend any live match, and re-admitting one could duplicate
   * a match whose emitted marker was already pruned — the reference
   * CepOperator likewise drops late elements).
   * Eviction by ts removes a prefix of the sorted buffer, so strict
   * (`next`) adjacency among retained events is unchanged. Patterns
   * without `within` keep everything (documented: unbounded patterns
   * need a horizon for bounded state, as in the reference).
   */
  /** Step name of the pseudo-bindings emitted for unmatched rows
   * (MATCH_RECOGNIZE `ALL ROWS PER MATCH WITH UNMATCHED ROWS`):
   * a one-element match whose single bind carries the row. */
  val UnmatchedStep = "__unmatched"

  /** Step-name PREFIX marking the binds of a timed-out partial match
   * (reference `TimedOutPartialMatchHandler` /
   * `PatternStream.flatSelect(timeoutTag, …)` —
   * `cep/PatternStream.java:26`): a partial match whose `within`
   * window closed before the pattern completed is emitted with each
   * bind's step renamed to `"__timedout:" + step`, so the channel is
   * detectable from `binds.head.step` and the original step names stay
   * recoverable (the reference hands the handler the partial
   * `Map<String, List<T>>` — same information). Only runs still ALIVE
   * at window expiry qualify — a partial killed earlier by a
   * strict-contiguity mismatch or a violated negative step dies as a
   * MISS, exactly as the reference handler never sees mismatch-killed
   * computation states (see `partialPrefixMatches.aliveAtExpiry`). */
  val TimedOutStep = "__timedout"

  /** Step name of the pseudo-binding emitted for a too-late event
   * (reference `PatternStream.sideOutputLateData` —
   * `cep/PatternStream.java:76`): an event dropped at entry because it
   * arrived below the operator's admission horizon is surfaced as a
   * one-bind pseudo-match instead of vanishing. */
  val LateStep = "__late"

  /** Longest PROPER-prefix binding per requested start event: for each
   * start id in `startIds`, the maximal `k < steps.length` such that
   * `steps.take(k)` matches starting at that event. Implements the
   * timed-out partial-match content (the reference NFA keeps partial
   * computation states per run and hands the timed-out one to the
   * handler; this re-scan engine reconstructs it at eviction time,
   * once per event lifetime, with ≤ steps−1 truncated scans per
   * batch). Truncations that cannot stand alone — a trailing
   * non-consuming negative step, or no required consuming step — are
   * skipped (their binding equals the next-shorter prefix anyway). */
  private def partialPrefixMatches[T](events: IndexedSeq[T], p: Pattern[T],
      time: T => Long, id: T => Long, startIds: Set[Long]): List[MatchG[T]] = {
    val found = scala.collection.mutable.Map.empty[Long, (MatchG[T], Int)]
    // id → buffer index, built once: aliveAtExpiry resolves each
    // candidate's last bound event in O(1). A linear indexWhere here
    // was candidates × buffer — quadratic on a hot-key flood (caught
    // by the round-15 sf10 sweep: 38k timed-out candidates over a 10M
    // single-key buffer pinned one core for hours)
    val idIdx = new java.util.HashMap[Long, Integer](events.length * 2)
    var ii = 0
    while (ii < events.length) { idIdx.put(id(events(ii)), ii); ii += 1 }
    def mustConsume(q: Quant): Boolean = q match {
      case Once | OneOrMore | OneOrMoreReluctant | OneOrMoreRelaxed |
           OneOrMoreCombinations | Any => true
      case _ => false
    }
    var k = p.steps.length - 1
    while (k >= 1 && found.size < startIds.size) {
      val steps = p.steps.take(k)
      val last = steps.last.quant
      if (last != NotNext && last != NotFollowed && steps.exists(s => mustConsume(s.quant))) {
        // NoSkip so every start is probed independently (a truncated
        // skip region must not shadow another evicted start's probe)
        val sub = p.copy(steps = steps, skip = NoSkip, holdToHorizon = false)
        matchSortedG(events, sub, time, id).foreach { m =>
          val sid = id(m.binds.head.ev)
          if (startIds(sid) && !found.contains(sid)) found(sid) = (m, k)
        }
      }
      k -= 1
    }
    // Reference fidelity (TimedOutPartialMatchHandler only receives
    // partials discarded by WINDOW EXPIRY, `cep/PatternStream.java:26`
    // — a computation state killed by a strict-contiguity mismatch or
    // a violated negative step dies as a MISS, well inside the
    // window): a maximal prefix is a timed-out run only if it was
    // still ALIVE when the horizon closed. Relaxed positive next steps
    // can always still be satisfied by a future in-window event; a
    // STRICT next step whose adjacency slot is already consumed by a
    // (necessarily non-qualifying — else the prefix would be longer)
    // event inside both horizons was killed, not timed out; NotNext /
    // NotFollowed runs die the moment a qualifying event lands in the
    // forbidden slot/range.
    def aliveAtExpiry(m: MatchG[T], k: Int): Boolean = {
      if (k >= p.steps.length) return false
      val nxt = p.steps(k)
      val lastIdxBoxed = idIdx.get(id(m.binds.last.ev))
      if (lastIdxBoxed == null) return true
      val lastIdx = lastIdxBoxed.intValue
      def inWin(j: Int) = j < events.length &&
        time(events(j)) - m.start_us <= p.withinUs
      def gapOk2(j: Int) = p.stepGapUs == Long.MaxValue ||
        time(events(j)) - time(events(lastIdx)) <= p.stepGapUs
      def ctxAtJ(j: Int): MatchCtx[T] = new MatchCtx[T] {
        def eventsFor(step: String): Seq[T] = m.binds.collect {
          case b if b.step == step || b.step.startsWith(step + "#") => b.ev
        }
        def prev(offset: Int): Option[T] =
          if (offset >= 1 && j - offset >= 0) Some(events(j - offset)) else None
      }
      nxt.quant match {
        case NotNext =>
          val j = lastIdx + 1
          !(inWin(j) && nxt.pred(events(j), ctxAtJ(j)))
        case NotFollowed =>
          !((lastIdx + 1) until events.length)
            .exists(j => inWin(j) && nxt.pred(events(j), ctxAtJ(j)))
        case _ if nxt.strict =>
          val j = lastIdx + 1
          !(inWin(j) && gapOk2(j))
        case _ => true
      }
    }
    found.values.collect { case (m, k) if aliveAtExpiry(m, k) => m }
      .toList.sortBy(m => (m.start_us, id(m.binds.head.ev)))
  }

  /** BATCH-mode pattern matching over a bounded per-key dataset
   * (reference `BatchExecMatch` — the batch planner runs the same
   * MATCH_RECOGNIZE operator over sorted bounded input): per key,
   * sort by (time, id) and run the matcher once. No watermark, no
   * buffering state; `unmatched` emission is exact because the full
   * input is known. Scale: flatMapGroups materializes one key's rows
   * — the same per-key-sorted bound as the reference's batch match
   * operator (keys are independent; the shuffle is by key). */
  def batchBoundBy[T <: Product : TypeTag](ds: Dataset[T], pattern: Pattern[T],
      keyField: String, timeField: String, idField: String,
      unmatched: Boolean = false): Dataset[CepBoundG[T]] = {
    validate(pattern)
    implicit val tEnc: org.apache.spark.sql.Encoder[T] = Encoders.product[T]
    implicit val outEnc: org.apache.spark.sql.Encoder[CepBoundG[T]] =
      Encoders.product[CepBoundG[T]]
    implicit val keyEnc: org.apache.spark.sql.Encoder[String] = Encoders.STRING
    val schema = tEnc.schema
    val (ki, ti, ii) = (schema.fieldIndex(keyField),
      schema.fieldIndex(timeField), schema.fieldIndex(idField))
    val key: T => String = t => String.valueOf(t.productElement(ki))
    val time: T => Long = t => t.productElement(ti).asInstanceOf[Number].longValue
    val id: T => Long = t => t.productElement(ii).asInstanceOf[Number].longValue
    ds.groupByKey(key).flatMapGroups { (k: String, it: Iterator[T]) =>
      val buf = it.toIndexedSeq.sortBy(e => (time(e), id(e)))
      val ms = matchSortedG(buf, pattern, time, id)
      val out = ms.map(m => CepBoundG(k, m.start_us, m.end_us, m.binds))
      val un =
        if (!unmatched) Nil
        else {
          val matched = ms.flatMap(_.binds.map(b => id(b.ev))).toSet
          buf.filterNot(e => matched(id(e))).toList
            .map(e => CepBoundG(k, time(e), time(e), List(BoundG(UnmatchedStep, e))))
        }
      (out ++ un).iterator
    }
  }

  def runBoundBy[T <: Product : TypeTag](ds: Dataset[T], pattern: Pattern[T],
      keyField: String, timeField: String, idField: String,
      watermarkDelay: String = "1 hour",
      ttl: Option[String] = None,
      unmatched: Boolean = false,
      timedOut: Boolean = false,
      lateCapture: Boolean = false): Dataset[CepBoundG[T]] = {
    validate(pattern) // fail fast on the driver
    require(!timedOut || pattern.withinUs != Long.MaxValue,
      "timed-out partial emission requires within(): watermark eviction of " +
      "the within horizon IS the timeout point (reference CepOperator times " +
      "out a partial when the watermark passes start + within)")
    require(!unmatched || pattern.withinUs != Long.MaxValue,
      "unmatched-row emission requires within(): eviction of the within " +
      "horizon is what makes 'participates in no match' final — without " +
      "it nothing is ever evicted and unmatched rows would never emit")
    implicit val tEnc: org.apache.spark.sql.Encoder[T] = Encoders.product[T]
    implicit val stEnc: org.apache.spark.sql.Encoder[CepStateG[T]] =
      Encoders.product[CepStateG[T]]
    implicit val outEnc: org.apache.spark.sql.Encoder[CepBoundG[T]] =
      Encoders.product[CepBoundG[T]]
    implicit val keyEnc: org.apache.spark.sql.Encoder[String] = Encoders.STRING
    // accessors by case-class field position (product order == encoder
    // schema order), so the closures capture plain ints
    val schema = tEnc.schema
    val ki = schema.fieldIndex(keyField)
    val ti = schema.fieldIndex(timeField)
    val ii = schema.fieldIndex(idField)
    val key: T => String = t => String.valueOf(t.productElement(ki))
    val time: T => Long = t => t.productElement(ti).asInstanceOf[Number].longValue
    val id: T => Long = t => t.productElement(ii).asInstanceOf[Number].longValue
    val withWm = ds.toDF()
      .withColumn("__event_ts", timestamp_micros(col(timeField)))
      .withWatermark("__event_ts", watermarkDelay)
      .as[T]
    withWm.groupByKey(key)
      .flatMapGroupsWithState[CepStateG[T], CepBoundG[T]](OutputMode.Append, Ttl.timeoutConf(ttl))(
        Ttl.wrap(ttl)(cepFlatMap(pattern, time, id, unmatched, timedOut, lateCapture)))
  }

  /** [[runBoundBy]] for event types WITHOUT a product encoder — e.g. a
   * sealed trait hierarchy matched with `nextSubtype`/`followedBySubtype`
   * steps (reference `Pattern.java:196` subtype patterns are ADTs by
   * nature): accessors are functions and the element encoder comes from
   * the caller (typically `Encoders.kryo[T]`). The event time is
   * materialized as a real column through a (time, event) envelope so
   * the watermark machinery still applies; state and output encode via
   * kryo. Semantics are identical to [[runBoundBy]]. */
  def runBoundByF[T](ds: Dataset[T], pattern: Pattern[T], key: T => String,
      time: T => Long, id: T => Long, watermarkDelay: String = "1 hour",
      ttl: Option[String] = None)(
      implicit tEnc: org.apache.spark.sql.Encoder[T]): Dataset[CepBoundG[T]] = {
    validate(pattern) // fail fast on the driver
    implicit val stEnc: org.apache.spark.sql.Encoder[CepStateG[T]] =
      Encoders.kryo[CepStateG[T]]
    implicit val outEnc: org.apache.spark.sql.Encoder[CepBoundG[T]] =
      Encoders.kryo[CepBoundG[T]]
    implicit val keyEnc: org.apache.spark.sql.Encoder[String] = Encoders.STRING
    implicit val envLongEnc: org.apache.spark.sql.Encoder[(Long, T)] =
      Encoders.tuple(Encoders.scalaLong, tEnc)
    implicit val envEnc: org.apache.spark.sql.Encoder[(java.sql.Timestamp, T)] =
      Encoders.tuple(Encoders.TIMESTAMP, tEnc)
    // the envelope's _1 IS the watermarked event-time column (a tuple
    // deserializer rejects extra columns, so the timestamp replaces the
    // raw micros in place)
    val withWm = ds.map(t => (time(t), t))
      .toDF()
      .select(timestamp_micros(col("_1")).as("_1"), col("_2"))
      .withWatermark("_1", watermarkDelay)
      .as[(java.sql.Timestamp, T)]
    val body = cepFlatMap(pattern, time, id)
    withWm.groupByKey(p => key(p._2))
      .flatMapGroupsWithState[CepStateG[T], CepBoundG[T]](OutputMode.Append, Ttl.timeoutConf(ttl))(
        Ttl.wrap(ttl)((k: String, it: Iterator[(java.sql.Timestamp, T)], st: GroupState[CepStateG[T]]) =>
          body(k, it.map(_._2), st)))
  }

  /** The skip floor target an emitted match establishes: the (ts, id,
   * strict) bound the NEXT match's start must clear. None for
   * NoSkip/SkipToNext (no region is consumed). Shared by the cross-
   * batch floor fold and the incremental in-batch selection. */
  private def skipTarget[T](pattern: Pattern[T], time: T => Long, id: T => Long)(
      m: MatchG[T]): Option[(Long, Long, Boolean)] = {
    def stepOf(n: String): String = n.takeWhile(_ != '#')
    val startId = id(m.binds.head.ev)
    pattern.skip match {
      case SkipPastLast => // resume AFTER the last consumed event
        val e = m.binds.last.ev; Some((time(e), id(e), true))
      case SkipToFirst(s0) => // resume AT the first event bound to s0
        m.binds.find(b => stepOf(b.step) == s0).map { b =>
          val (ts, eid) = (time(b.ev), id(b.ev))
          // jump to the start itself degenerates to start+1
          if (ts == m.start_us && eid == startId) (ts, eid, true) else (ts, eid, false)
        }.orElse(Some((m.start_us, startId, true)))
      case SkipToLast(s0) =>
        m.binds.reverse.find(b => stepOf(b.step) == s0).map { b =>
          val (ts, eid) = (time(b.ev), id(b.ev))
          if (ts == m.start_us && eid == startId) (ts, eid, true) else (ts, eid, false)
        }.orElse(Some((m.start_us, startId, true)))
      case _ => None // NoSkip / SkipToNext: no shadow to persist
    }
  }

  /** Diagnostic counter: (run, event) advance attempts + head probes
   * performed by [[incrementalScan]]. The hot-key flood spec pins the
   * cost model with it — append-only batches cost open-runs × NEW
   * events (the reference NFA's per-event bill, `cep/nfa/NFA.java:86`),
   * not open-runs × whole-buffer re-scans. Test instrumentation only —
   * incremented nowhere else. */
  val scanOps = new java.util.concurrent.atomic.LongAdder

  /** Patterns the incremental matcher handles: a linear chain of
   * single-consume steps (strict or relaxed, iterative conditions
   * fine, any skip strategy), plus AT MOST ONE quantified loop step in
   * two families where the preferred binding is provably maintainable
   * per event without backtracking over the buffer:
   *
   *  - `OneOrMoreRelaxed` (the fluent `oneOrMore` — the reference's
   *    default reluctant relaxed loop) when every LATER step is a
   *    relaxed ctx-free `Once` and no per-step gap is set. The
   *    reluctant preference tries the continuation after the FIRST
   *    repetition, and a continuation of relaxed ctx-free Once steps
   *    searched from the first repetition sees a SUPERSET of every
   *    longer run's search range — so the first-rep branch completes
   *    whenever any branch does, and it is the preferred one
   *    (first-closing dominance). The loop degenerates to one relaxed
   *    consume; run count stays one per start.
   *
   *  - strict greedy `OneOrMore`/`ZeroOrMore` (`oneOrMoreNext` /
   *    `zeroOrMoreNext`) when every later step is a ctx-free `Once`.
   *    The repetition block is CONTIGUOUS, so no continuation event
   *    can hide inside it: the max-reps closing dominates every
   *    shorter prefix (same continuation anchor, smallest step gap,
   *    only it can satisfy strict adjacency). One extender run per
   *    start suffices, plus one bounded backtrack fork per event that
   *    satisfies BOTH the loop and the continuation predicate (the
   *    branch the batch enumerator reaches by backtracking one rep).
   *
   * Everything else (multiple loops, optional steps, alternations,
   * until, combinations, negations, quantified heads, ctx-dependent
   * tails) keeps the re-scan path — their preferred bindings depend on
   * lookahead/backtracking that appending events can reshape, which
   * the per-batch re-derivation already handles. */
  private[graft] def incrementalEligible[T](p: Pattern[T]): Boolean = {
    if (p.holdToHorizon) false
    else if (!p.steps.forall(s => s.alts.isEmpty && s.until.isEmpty)) false
    else {
      val loops = p.steps.zipWithIndex.filter(_._1.quant != Once)
      if (loops.isEmpty) true
      else if (loops.sizeIs > 1) false
      else {
        val (ls, li) = loops.head
        val tail = p.steps.drop(li + 1)
        if (li == 0) false
        else ls.quant match {
          case OneOrMoreRelaxed =>
            !ls.strict && ctxFree(ls.pred) && p.stepGapUs == Long.MaxValue &&
              tail.forall(t => t.quant == Once && !t.strict && ctxFree(t.pred))
          case OneOrMore | ZeroOrMore =>
            ls.strict && ctxFree(ls.pred) &&
              tail.forall(t => t.quant == Once && ctxFree(t.pred))
          case _ => false
        }
      }
    }
  }

  /** One incremental pass over `events(fromIdx until length)`: restored
   * open runs (the reference's computation states) advance per event —
   * strict adjacency via an at-frontier flag, relaxed steps consume
   * the first qualifying event, window/per-step-gap violations kill
   * permanently (time order makes every such death final) — and new
   * runs spawn at qualifying head events after `floor0`. A reluctant
   * relaxed loop consumes exactly its first repetition (first-closing
   * dominance, see [[incrementalEligible]]); a strict greedy loop
   * keeps ONE extender run that closes into the continuation at the
   * first non-qualifying event, plus a bounded backtrack fork per
   * event satisfying both the loop and the continuation predicate.
   * Per-start completions reduce to the batch enumerator's preferred
   * branch (greedy: most repetitions; reluctant: fewest) before the
   * in-batch skip selection in start order (the consumed-region
   * discipline [[matchSortedG]] applies in-scan).
   * Returns (selected completions, surviving open-run snapshots —
   * binds encoded as interleaved (stepIdx, eventId) pairs).
   * Semantically equal to the per-batch re-scan for
   * [[incrementalEligible]] patterns — pinned by the randomized
   * differential in CepSpec/StreamPropertySpec. */
  private def incrementalScan[T](events: IndexedSeq[T], fromIdx: Int,
      restored: List[(Int, Int, Vector[(Int, Int)])], p: Pattern[T],
      time: T => Long, id: T => Long, floor0: (Long, Long, Boolean))
      : (List[MatchG[T]], List[(Long, Int, List[Long])]) = {
    val steps = p.steps
    val noCtx = EmptyCtx.asInstanceOf[MatchCtx[T]]
    val loopIdx = steps.indexWhere(_.quant != Once) // -1 for all-Once chains
    def minRepsOf(q: Quant): Int = if (q == ZeroOrMore) 0 else 1
    def afterF(ts: Long, eid: Long, f: (Long, Long, Boolean)): Boolean = {
      val c = java.lang.Long.compare(ts, f._1)
      val c2 = if (c != 0) c else java.lang.Long.compare(eid, f._2)
      if (f._3) c2 > 0 else c2 >= 0
    }
    class R(val startIdx: Int, var k: Int, var binds: Vector[(Int, Int)],
        var atFrontier: Boolean, var reps: Int) { var dead = false }
    val open = scala.collection.mutable.ArrayBuffer.empty[R]
    restored.foreach { case (si, k, bs) =>
      open += new R(si, k, bs,
        atFrontier = (if (bs.nonEmpty) bs.last._2 else si) == fromIdx - 1,
        reps = bs.count(_._1 == k))
    }
    // completions carry their bind indexes so the per-start preference
    // can compare repetition counts before materializing
    val comps = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Vector[(Int, Int)])]
    def complete(startIdx: Int, endIdx: Int, binds: Vector[(Int, Int)]): Unit =
      comps += ((startIdx, time(events(endIdx)), binds))
    def ctxFor(binds: Vector[(Int, Int)], j: Int): MatchCtx[T] = new MatchCtx[T] {
      def eventsFor(step: String): Seq[T] = binds.collect {
        case (si2, x) if steps(si2).name == step ||
          steps(si2).name.startsWith(step + "#") => events(x)
      }
      def prev(offset: Int): Option[T] =
        if (offset >= 1 && j - offset >= 0) Some(events(j - offset)) else None
    }
    var j = fromIdx
    while (j < events.length) {
      val e = events(j)
      val ts = time(e)
      val spawned = scala.collection.mutable.ArrayBuffer.empty[R]
      var ri = 0
      while (ri < open.length) {
        val r = open(ri)
        scanOps.increment()
        val start = events(r.startIdx)
        if (ts - time(start) > p.withinUs) r.dead = true // window closed
        else {
          // `again` lets a closing strict-loop extender re-evaluate the
          // SAME event at its continuation step (the event that broke
          // the block may itself be the continuation's consume)
          var again = true
          while (again && !r.dead && r.k < steps.length) {
            again = false
            val stp = steps(r.k)
            val lastIdx = if (r.binds.nonEmpty) r.binds.last._2 else r.startIdx
            if (p.stepGapUs != Long.MaxValue && ts - time(events(lastIdx)) > p.stepGapUs)
              r.dead = true // per-step gap can only grow — permanent
            else stp.quant match {
              case OneOrMoreRelaxed =>
                // first-closing dominance: consume the first qualifying
                // repetition and immediately prefer the continuation
                if (stp.pred(e, noCtx)) {
                  r.binds :+= ((r.k, j)); r.k += 1; r.atFrontier = true; r.reps = 0
                  if (r.k == steps.length) { complete(r.startIdx, j, r.binds); r.dead = true }
                } else r.atFrontier = false
              case OneOrMore | ZeroOrMore => // strict greedy extender
                val minReps = minRepsOf(stp.quant)
                if (r.atFrontier && stp.pred(e, noCtx)) {
                  // backtrack fork: greedy prefers e as another rep, but
                  // if e ALSO starts the continuation, the one-rep-
                  // shorter closing is the branch the batch enumerator
                  // reaches by backtracking — spawn it once
                  if (r.k + 1 < steps.length && r.reps >= minReps) {
                    val nxt = steps(r.k + 1)
                    scanOps.increment()
                    if (nxt.pred(e, noCtx)) {
                      val fb = r.binds :+ ((r.k + 1, j))
                      if (r.k + 2 == steps.length) complete(r.startIdx, j, fb)
                      else spawned += new R(r.startIdx, r.k + 2, fb,
                        atFrontier = true, reps = 0)
                    }
                  }
                  r.binds :+= ((r.k, j)); r.atFrontier = true; r.reps += 1
                } else if (r.reps >= minReps) {
                  // block closed (non-qualifying event): move to the
                  // continuation and re-evaluate THIS event there
                  r.k += 1; r.reps = 0
                  if (r.k == steps.length) {
                    complete(r.startIdx, r.binds.last._2, r.binds); r.dead = true
                  } else again = true
                } else r.dead = true // OneOrMore with zero reps
              case _ => // Once (strict or relaxed)
                if (stp.strict && !r.atFrontier) r.dead = true
                else {
                  val pred = stp.pred
                  if (pred(e, if (ctxFree(pred)) noCtx else ctxFor(r.binds, j))) {
                    r.binds :+= ((r.k, j)); r.k += 1; r.atFrontier = true
                    if (r.k == steps.length) {
                      complete(r.startIdx, j, r.binds)
                      r.dead = true // completed — one match per start
                    }
                  } else if (stp.strict) r.dead = true // adjacency slot consumed
                  else r.atFrontier = false
                }
            }
          }
        }
        ri += 1
      }
      open.filterInPlace(r => !r.dead)
      open ++= spawned
      // spawn a new run anchored at j
      val head = steps.head
      scanOps.increment()
      if (head.pred(e, if (ctxFree(head.pred)) noCtx else ctxFor(Vector.empty, j)) &&
          afterF(ts, id(e), floor0)) {
        if (steps.length == 1) comps += ((j, ts, Vector((0, j))))
        else open += new R(j, 1, Vector((0, j)), atFrontier = true, reps = 0)
      }
      j += 1
    }
    // trailing greedy loop: the longest block so far is a complete
    // match as of this buffer (the re-scan's preferred branch this
    // batch). The run stays open — a longer completion next batch
    // dedups on the caller's per-start marker.
    if (loopIdx == steps.length - 1 && loopIdx > 0 &&
        (steps(loopIdx).quant == OneOrMore || steps(loopIdx).quant == ZeroOrMore))
      open.foreach { r =>
        if (r.k == loopIdx && r.reps >= minRepsOf(steps(loopIdx).quant))
          complete(r.startIdx, r.binds.last._2, r.binds)
      }
    // per-start preference: the batch enumerator's branch order —
    // greedy loops prefer MORE repetitions, reluctant fewer; Once
    // steps are deterministic given the start, so completions of one
    // start differ only at the loop step
    val loopGreedy = loopIdx >= 0 &&
      (steps(loopIdx).quant == OneOrMore || steps(loopIdx).quant == ZeroOrMore)
    val reduced: Seq[(Int, Long, Vector[(Int, Int)])] =
      if (loopIdx < 0) comps.toSeq
      else comps.groupBy(_._1).valuesIterator.map { ms =>
        ms.reduceLeft { (x, y) =>
          val (rx, ry) = (x._3.count(_._1 == loopIdx), y._3.count(_._1 == loopIdx))
          if (rx == ry) x else if (loopGreedy == (ry > rx)) y else x
        }
      }.toSeq
    val matches = reduced.map { case (si, endTs, bs) =>
      MatchG(time(events(si)), endTs,
        bs.map { case (si2, x) => BoundG(steps(si2).name, events(x)) }.toList)
    }
    // in-batch skip selection in start order — identical discipline to
    // matchSortedG's in-scan consumed-region jumps
    var lf = floor0
    val selected = List.newBuilder[MatchG[T]]
    matches.sortBy(m => (m.start_us, id(m.binds.head.ev))).foreach { m =>
      if (afterF(m.start_us, id(m.binds.head.ev), lf)) {
        selected += m
        skipTarget(p, time, id)(m).foreach { t =>
          val c = java.lang.Long.compare(t._1, lf._1)
          val c2 = if (c != 0) c else java.lang.Long.compare(t._2, lf._2)
          if (c2 > 0) lf = t
          else if (c2 == 0) lf = (lf._1, lf._2, lf._3 || t._3)
        }
      }
    }
    val runsOut = open.iterator
      .filter(r => afterF(time(events(r.startIdx)), id(events(r.startIdx)), lf))
      .map(r => (id(events(r.startIdx)), r.k,
        r.binds.iterator.flatMap { case (si2, x) =>
          Iterator(si2.toLong, id(events(x))) }.toList))
      .toList
    (selected.result(), runsOut)
  }

  /** The per-key micro-batch body shared by [[runBoundBy]] and
   * [[runBoundByF]]: buffer + re-match + dedup + watermark eviction.
   * With `unmatched` on, a row leaving the buffer that never
   * participated in an emitted match is emitted as a one-bind
   * [[UnmatchedStep]] pseudo-match (the reference's
   * `ALL ROWS PER MATCH WITH UNMATCHED ROWS` codegen emits unmatched
   * rows from the same operator) — emission happens at eviction time
   * because only then is "participates in no match" final. */
  private def cepFlatMap[T](pattern: Pattern[T], time: T => Long, id: T => Long,
      unmatched: Boolean = false, timedOut: Boolean = false,
      lateCapture: Boolean = false)
      : (String, Iterator[T], GroupState[CepStateG[T]]) => Iterator[CepBoundG[T]] = {
        (k, it, state: GroupState[CepStateG[T]]) =>
          val st = state.getOption.getOrElse(CepStateG[T](Nil, Nil))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val live: Long => Boolean =
            if (wmUs <= 0L || pattern.withinUs == Long.MaxValue) _ => true
            else ts => ts >= wmUs - pattern.withinUs
          // Drop too-late arrivals at entry (NoTimeout admits them): an
          // event below the eviction horizon can never extend a live
          // match — any match containing it ends before the watermark —
          // but re-admitting it could re-create a match whose emitted
          // marker was already pruned, emitting a duplicate. Mirrors the
          // reference CepOperator dropping late elements. Patterns that
          // assert ABSENCE (NotFollowed/NotNext) drop everything below
          // the watermark itself — the reference's exact late-element
          // rule — because a sub-watermark arrival landing in an emitted
          // match's gap would falsify it unretractably; the emission
          // hold below only protects against events at or above the
          // watermark.
          val negated =
            pattern.steps.exists(s => s.quant == NotFollowed || s.quant == NotNext)
          val admit: Long => Boolean =
            if (wmUs <= 0L) _ => true
            else if (negated) ts => ts >= wmUs
            else live
          // Events at or before the persisted skip floor can never
          // participate in a future match (a new match must START
          // after the floor, and its content follows its start) — drop
          // them BEFORE scanning, the analog of the reference
          // releasing skip-consumed SharedBuffer entries. Without
          // this, a re-scan after eviction could bind a pre-floor
          // start whose (suppressed) match shadows a LEGITIMATE later
          // start via the in-scan skip. Side effect (documented): PREV
          // navigation cannot reach into a previous match's consumed
          // region, same as the reference's pruned buffer.
          def afterFloor(ts: Long, eid: Long, fTs: Long, fId: Long, fStrict: Boolean): Boolean = {
            val c = java.lang.Long.compare(ts, fTs)
            val c2 = if (c != 0) c else java.lang.Long.compare(eid, fId)
            if (fStrict) c2 > 0 else c2 >= 0
          }
          // late capture (reference PatternStream.sideOutputLateData):
          // events below the admission horizon are surfaced on the
          // tagged channel instead of silently vanishing
          val (arrived, lateDropped) = it.toList.partition(e => admit(time(e)))
          val lateOut =
            if (!lateCapture) Nil
            else lateDropped.map(e =>
              CepBoundG(k, time(e), time(e), List(BoundG(LateStep, e))))
          // Events at or before the persisted skip floor are dropped
          // from the buffer BEFORE scanning (see above) — but with
          // unmatched-row emission on, their verdict is already final
          // (they provably cannot join any future match), so they are
          // routed to the unmatched output rather than discarded: the
          // SQL:2016 invariant is that every row appears either in a
          // match or as unmatched.
          val (admitted, floorDropped) = (st.buffer ++ arrived)
            .partition(e => afterFloor(time(e), id(e), st.floorTs, st.floorId, st.floorStrict))
          val buffer = admitted.sortBy(e => (time(e), id(e)))
          val bufferIdx = buffer.toIndexedSeq
          val incremental = incrementalEligible(pattern)
          // append-only iff every arrival sorts strictly after the
          // retained buffer — the common in-order case, where open runs
          // RESUME over just the new events (reference NFA cost: active
          // runs × new events) instead of re-deriving over the buffer
          val appendOnly = incremental && st.buffer.lastOption.forall { last =>
            val (lts, lid) = (time(last), id(last))
            arrived.forall { e =>
              val c = java.lang.Long.compare(time(e), lts)
              (if (c != 0) c else java.lang.Long.compare(id(e), lid)) > 0
            }
          }
          var runsOut: List[(Long, Int, List[Long])] = Nil
          val all =
            if (incremental) {
              val idIdx = new java.util.HashMap[Long, Integer](bufferIdx.length * 2)
              var i2 = 0
              while (i2 < bufferIdx.length) { idIdx.put(id(bufferIdx(i2)), i2); i2 += 1 }
              val fromIdx = if (appendOnly) st.buffer.length else 0
              // persisted binds are interleaved (stepIdx, eventId)
              // pairs — decode against the current buffer, dropping
              // any run whose events were evicted or whose strictness
              // invariant no longer holds (it died last batch)
              val restored: List[(Int, Int, Vector[(Int, Int)])] =
                if (!appendOnly) Nil // out-of-order merge: re-derive from scratch
                else st.runs.flatMap { case (sid, k, flat) =>
                  val si = idIdx.get(sid)
                  if (si == null || k > pattern.steps.length ||
                      flat.length % 2 != 0) None
                  else {
                    val pairs = flat.grouped(2).map {
                      case List(s2, eid) =>
                        val bi = idIdx.get(eid)
                        if (bi == null || s2 < 0 || s2 >= pattern.steps.length ||
                            s2 > k) None
                        else Some((s2.toInt, bi.intValue))
                      case _ => None
                    }.toVector
                    if (pairs.exists(_.isEmpty)) None
                    else {
                      val v = pairs.flatten
                      val lastIdx = if (v.nonEmpty) v.last._2 else si.intValue
                      // a run whose CURRENT step demands adjacency
                      // (strict Once, or a strict-loop extender — which
                      // only ever persists at the frontier) died if any
                      // event followed its last bind
                      val needsFrontier = k < pattern.steps.length && {
                        val s = pattern.steps(k)
                        s.quant match {
                          case Once => s.strict
                          case OneOrMore | ZeroOrMore => true
                          case _ => false
                        }
                      }
                      if (needsFrontier && lastIdx != fromIdx - 1) None
                      else Some((si.intValue, k, v))
                    }
                  }
                }
              val (sel, ro) = incrementalScan(bufferIdx, fromIdx, restored,
                pattern, time, id, (st.floorTs, st.floorId, st.floorStrict))
              runsOut = ro
              sel
            } else matchSortedG(bufferIdx, pattern, time, id)
          // A pattern containing a negative step asserts ABSENCE, which
          // a later batch can falsify with a late in-horizon event — so
          // when a within bound exists, hold its matches until the
          // watermark closes the window (at pattern end this is also
          // the only point absence becomes provable). Unconfirmed
          // candidates stay unmarked and re-surface (their events
          // outlive them: start_us >= wm - within while open).
          // `emitOnHorizon` holds EVERY match the same way: once the
          // watermark closes the start's within window, no in-order
          // arrival can still grow the preferred match — emission is
          // then the preference over the complete horizon, identical
          // to the batch matcher (exact greedy/relaxed parity).
          val confirmed =
            if (!negated && !pattern.holdToHorizon) all // validate(): negated => within()
            // subtraction form: start + within can overflow Long for
            // large within; wmUs >= 0 makes wmUs - within overflow-safe
            else all.filter(m => wmUs > 0L && m.start_us < wmUs - pattern.withinUs)
          // Dedup marker: one match per start for the deterministic
          // earliest-match subset — a late event may CHANGE the
          // preferred binding for an emitted start, and re-emitting the
          // new binding would duplicate the match. followedByAny
          // patterns legitimately emit many matches per start, so they
          // dedup on the full binding signature (splitmix64-mixed ids;
          // collisions negligible).
          val anyPattern = pattern.steps.exists(s =>
            s.quant == Any || s.quant == OneOrMoreCombinations)
          def mix(h0: Long, v: Long): Long = {
            var z = h0 + 0x9E3779B97F4A7C15L + v
            z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
            z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
            z ^ (z >>> 31)
          }
          def sig(m: MatchG[T]): Long =
            if (!anyPattern) id(m.binds.head.ev)
            else m.binds.foldLeft(m.binds.length.toLong)((h, b) => mix(h, id(b.ev)))
          val seen = st.emitted.map(p => (p._1, p._2)).toSet
          // The after-match skip contract must survive eviction: a
          // match may only start at or after the persisted floor (set
          // below from every emitted match's skip jump target).
          // NoSkip/SkipToNext never set a floor. Late out-of-order
          // completions of a pre-floor start are suppressed too — the
          // skip consumed that region and emitted matches cannot be
          // retracted (same stance as the reference's non-retractable
          // skip regions under late events).
          def cmpFloor(ts: Long, eid: Long): Int = {
            val c = java.lang.Long.compare(ts, st.floorTs)
            if (c != 0) c else java.lang.Long.compare(eid, st.floorId)
          }
          def floorAllows(m: MatchG[T]): Boolean = {
            val c = cmpFloor(m.start_us, id(m.binds.head.ev))
            if (st.floorStrict) c > 0 else c >= 0
          }
          val fresh = confirmed
            .filterNot(m => seen.contains((m.start_us, sig(m))))
            .filter(floorAllows)
          val emitted = st.emitted ++ fresh.map(m => (m.start_us, sig(m)))
          // advance the floor to each fresh match's skip jump target
          val (floorTs, floorId, floorStrict) =
            fresh.foldLeft((st.floorTs, st.floorId, st.floorStrict)) { case (f @ (fts, fid, fst), m) =>
              skipTarget(pattern, time, id)(m).fold(f) { case (ts, eid, strict) =>
                val c = java.lang.Long.compare(ts, fts)
                val c2 = if (c != 0) c else java.lang.Long.compare(eid, fid)
                if (c2 > 0) (ts, eid, strict)
                else if (c2 == 0) (fts, fid, fst || strict)
                else f
              }
            }
          // end-of-batch trim: the watermark horizon AND the floor
          // advanced by this batch's emissions (its consumed region is
          // closed — next batch's scan must resume after it)
          val (kept, evicted) = buffer.partition(e =>
            live(time(e)) && afterFloor(time(e), id(e), floorTs, floorId, floorStrict))
          // participation = membership in ANY emitted match's binds
          // (held/unconfirmed matches keep their rows in the buffer,
          // so an evicted row's verdict is final)
          val matchedAll: Long => Boolean =
            if (!unmatched && !timedOut) _ => false
            else st.matchedIds.toSet ++
              fresh.iterator.flatMap(_.binds.iterator.map(b => id(b.ev)))
          val unmatchedOut =
            if (!unmatched) Nil
            else (evicted ++ floorDropped).filterNot(e => matchedAll(id(e))).map(e =>
              CepBoundG(k, time(e), time(e), List(BoundG(UnmatchedStep, e))))
          // Timed-out partial matches (TimedOutPartialMatchHandler
          // analog): a watermark-evicted event whose within window
          // closed without participating in any match, but at which a
          // proper prefix of the pattern binds, is a pattern run that
          // STARTED and never completed — emit its maximal partial
          // binding with "__timedout:"-prefixed step names.
          // Floor-dropped events are excluded: the after-match skip
          // consumed their region, and the reference likewise discards
          // skip-released partial runs rather than timing them out.
          val timeoutOut =
            if (!timedOut) Nil
            else {
              val cands = evicted.filter(e => !live(time(e)) && !matchedAll(id(e)))
              if (cands.isEmpty) Nil
              else partialPrefixMatches(bufferIdx, pattern, time, id,
                  cands.map(id).toSet)
                .map(m => CepBoundG(k, m.start_us, m.end_us,
                  m.binds.map(b => BoundG(TimedOutStep + ":" + b.step, b.ev))))
            }
          val keptMatched =
            if (!unmatched && !timedOut) Nil
            else {
              val keptIds = kept.iterator.map(id).toSet
              (st.matchedIds ++ fresh.flatMap(_.binds.map(b => id(b.ev))))
                .distinct.filter(keptIds)
            }
          state.update(CepStateG(kept, emitted.filter(p => live(p._1)), keptMatched,
            floorTs, floorId, floorStrict, runsOut))
          (fresh.iterator.map(m => CepBoundG(k, m.start_us, m.end_us, m.binds))
            ++ unmatchedOut.iterator ++ timeoutOut.iterator ++ lateOut.iterator)
  }
}
