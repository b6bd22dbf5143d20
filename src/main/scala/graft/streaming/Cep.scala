package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One emitted pattern match: the matched event ids in step order. */
case class CepMatch(user_id: Long, event_ids: Seq[Long], start_us: Long, end_us: Long)

/** Buffered per-key state: all events seen so far (ts-ordered on use)
 * plus the start-event ids of matches already emitted. */
case class CepState(buffer: List[Ev], emittedStarts: List[Long])

/**
 * A linear CEP pattern: ordered steps, each a predicate plus a
 * contiguity mode, with an overall `within` bound. Mirrors the
 * reference pattern surface `cep/pattern/Pattern.java:155-416`
 * (`begin/next/followedBy/within`) on a simple-NFA subset — no
 * quantifiers/optional/greedy yet (see Scaladoc of `Cep.run`).
 *
 * {{{
 * Cep.Pattern.begin("click", _.event_type == "click")
 *   .next("buy", _.event_type == "purchase")      // strictly adjacent
 *   .followedBy("ship", _.event_type == "ship")   // relaxed contiguity
 *   .within(10.minutes → micros)
 * }}}
 */
object Cep {

  final case class Step(name: String, pred: Ev => Boolean, strict: Boolean)

  final case class Pattern(steps: Vector[Step], withinUs: Long = Long.MaxValue) {
    def next(name: String, pred: Ev => Boolean): Pattern =
      copy(steps = steps :+ Step(name, pred, strict = true))
    def followedBy(name: String, pred: Ev => Boolean): Pattern =
      copy(steps = steps :+ Step(name, pred, strict = false))
    def within(us: Long): Pattern = copy(withinUs = us)
  }

  object Pattern {
    def begin(name: String, pred: Ev => Boolean): Pattern =
      Pattern(Vector(Step(name, pred, strict = false)))
  }

  /** Match the pattern over one key's ts-ordered event list.
   *
   * Semantics (deterministic subset of the reference NFA,
   * `cep/nfa/NFA.java:86`): a match may begin at every row whose first
   * predicate holds (NO_SKIP after-match strategy); each subsequent
   * step consumes the FIRST qualifying later event (earliest-match
   * greediness); `next` requires strict adjacency in the ordered
   * stream, `followedBy` allows gaps; the whole match must span at
   * most `withinUs` microseconds. */
  private[streaming] def matchSorted(events: IndexedSeq[Ev], p: Pattern): List[CepMatch] = {
    val out = List.newBuilder[CepMatch]
    var i = 0
    while (i < events.length) {
      val start = events(i)
      if (p.steps.head.pred(start)) {
        var ok = true
        var pos = i
        val ids = Vector.newBuilder[Long]
        ids += start.event_id
        var stepIdx = 1
        while (ok && stepIdx < p.steps.length) {
          val st = p.steps(stepIdx)
          if (st.strict) {
            val j = pos + 1
            if (j < events.length && st.pred(events(j)) &&
                events(j).ts_us - start.ts_us <= p.withinUs) {
              ids += events(j).event_id; pos = j
            } else ok = false
          } else {
            var j = pos + 1
            var found = -1
            while (found < 0 && j < events.length &&
                   events(j).ts_us - start.ts_us <= p.withinUs) {
              if (st.pred(events(j))) found = j
              j += 1
            }
            if (found >= 0) { ids += events(found).event_id; pos = found }
            else ok = false
          }
          stepIdx += 1
        }
        if (ok) out += CepMatch(start.user_id, ids.result(), start.ts_us, events(pos).ts_us)
      }
      i += 1
    }
    out.result()
  }

  /**
   * Run the pattern per user over a stream (flatMapGroupsWithState NFA,
   * reference `operator/CepOperator.java:81`). Each batch re-evaluates
   * over the full buffered, ts-sorted history and emits only matches
   * whose start event wasn't emitted before — so matches that straddle
   * micro-batch boundaries are found, and no match is emitted twice.
   *
   * State is the per-key event buffer: bounded in practice by the
   * pattern's `within` horizon (a production hardening would evict
   * events older than watermark - within; the reference NFA's
   * SharedBuffer does the same pruning on watermark advance).
   */
  def run(ds: Dataset[Ev], pattern: Pattern): Dataset[CepMatch] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[CepState, CepMatch](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, it, state: GroupState[CepState]) =>
          val st = state.getOption.getOrElse(CepState(Nil, Nil))
          val buffer = (st.buffer ++ it).sortBy(e => (e.ts_us, e.event_id))
          val all = matchSorted(buffer.toIndexedSeq, pattern)
          val seen = st.emittedStarts.toSet
          val fresh = all.filterNot(m => seen.contains(m.event_ids.head))
          state.update(CepState(buffer, st.emittedStarts ++ fresh.map(_.event_ids.head)))
          fresh.iterator
      }
  }
}
