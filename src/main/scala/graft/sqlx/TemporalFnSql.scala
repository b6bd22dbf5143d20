package graft.sqlx

import scala.collection.concurrent.TrieMap

/**
 * Temporal TABLE FUNCTION surface (reference
 * `flink-table-api-java/.../functions/TemporalTableFunction.java` +
 * `TemporalTableFunctionImpl`; usage
 * `tEnv.registerFunction("rates", history.createTemporalTableFunction(ts, key))`
 * then `FROM orders o, LATERAL TABLE (rates(o.rowtime)) AS r WHERE
 * o.currency = r.currency`): the older, function-shaped spelling of the
 * versioned temporal join — same semantics as `FOR SYSTEM_TIME AS OF`,
 * which is exactly how this front-end lowers it:
 *
 * {{{
 * FROM p, LATERAL TABLE (rates(p.ts)) AS r WHERE p.k = r.key AND rest
 *   -->
 * FROM p JOIN history FOR SYSTEM_TIME AS OF p.ts AS r
 *   ON r.key = p.k WHERE (1=1) AND rest
 * }}}
 *
 * after which [[TemporalSql.desugar]] + the temporal-join rule plan it
 * (batch: union+window as-of formulation; streaming: versioned-state
 * operator). The reference performs the identical collapse — its
 * LogicalCorrelate over a TemporalTableFunction converts to the same
 * temporal join as the SQL clause
 * (`LogicalCorrelateToJoinFromTemporalTableRule`).
 *
 * Documented subset, loud failures: the LATERAL TABLE must appear as a
 * comma-join, the function argument is a column reference, and the key
 * equality must appear as a top-level `alias.key = <ref>` (either
 * order) conjunct in the WHERE clause.
 */
object TemporalFnSql {

  /** fnName → (historyView, keyCol). */
  private val fns = TrieMap.empty[String, (String, String)]

  /** Register `fnName` as the temporal table function over `view`
   * versioned by (`timeCol`, `seqCol`) and keyed by `keyCol` — the
   * `createTemporalTableFunction(timeAttribute, primaryKey)` analog. */
  def registerTemporalFunction(fnName: String, view: String,
      timeCol: String, seqCol: String, keyCol: String): Unit = {
    TemporalSql.registerVersioned(view, timeCol, seqCol, keyCol)
    fns.put(fnName.toLowerCase, (view, keyCol))
  }

  private val LateralFn =
    """(?is),\s*LATERAL\s+TABLE\s*\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*\(\s*([A-Za-z_][A-Za-z0-9_.]*)\s*\)\s*\)\s*(?:AS\s+)?([A-Za-z_][A-Za-z0-9_]*)""".r

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"LATERAL TABLE: $msg")

  /** Rewrite every registered `, LATERAL TABLE (fn(ts)) AS alias` into
   * the `FOR SYSTEM_TIME AS OF` join form. No-op without the keyword. */
  def desugar(query: String): String = {
    var q = query
    var m = LateralFn.findFirstMatchIn(q)
    while (m.isDefined) {
      val mm = m.get
      val (fn, probeTs, alias) = (mm.group(1), mm.group(2), mm.group(3))
      val (view, keyCol) = fns.getOrElse(fn.toLowerCase,
        fail(s"'$fn' is not a registered temporal table function — call " +
          "TemporalFnSql.registerTemporalFunction(fn, view, timeCol, seqCol, keyCol)"))
      // ---- lift the key equality out of the WHERE clause
      val eqLeft = (s"""(?is)\\b$alias\\.$keyCol\\s*=\\s*([A-Za-z_][A-Za-z0-9_.]*)""").r
      val eqRight = (s"""(?is)([A-Za-z_][A-Za-z0-9_.]*)\\s*=\\s*$alias\\.$keyCol""").r
      val rest = q.substring(mm.end)
      val (probeKey, lifted) = eqLeft.findFirstMatchIn(rest) match {
        case Some(e) => (e.group(1), eqLeft.replaceFirstIn(rest, "(1=1)"))
        case None => eqRight.findFirstMatchIn(rest) match {
          case Some(e) => (e.group(1), eqRight.replaceFirstIn(rest, "(1=1)"))
          case None => fail(s"no '$alias.$keyCol = <probe key>' equality found " +
            s"in the WHERE clause for temporal function '$fn'")
        }
      }
      q = q.substring(0, mm.start) +
        s" JOIN $view FOR SYSTEM_TIME AS OF $probeTs AS $alias ON $alias.$keyCol = $probeKey" +
        lifted
      m = LateralFn.findFirstMatchIn(q)
    }
    q
  }
}
