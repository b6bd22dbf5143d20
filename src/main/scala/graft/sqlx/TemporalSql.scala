package graft.sqlx

import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.collection.concurrent.TrieMap

/**
 * `FOR SYSTEM_TIME AS OF` SQL surface (SURVEY §2.3 temporal join) — the
 * parser half of the reference's temporal-join pipeline: Flink's parser
 * turns the clause into a `LogicalSnapshot` under a correlate, then
 * `LogicalCorrelateToJoinFromTemporalTableRule` rewrites it into the
 * temporal join (`flink-table-planner/.../plan/rules/logical/LogicalCorrelateToJoinFromTemporalTableRule.scala`).
 * Spark's parser rejects the clause outright, so this front-end
 * desugars the SQL text instead:
 *
 * {{{
 * FROM probes p JOIN dims FOR SYSTEM_TIME AS OF p.ts AS d ON p.k = d.k
 *   -->
 * FROM probes p JOIN dims AS d
 *   ON p.k = d.k AND SYSTEM_TIME_AS_OF(d.<verTime>, d.<verSeq>, p.ts)
 * }}}
 *
 * which Spark CAN parse+resolve (the marker is a registered, deliberately
 * unevaluable function), and which
 * `graft.rules.StreamTemporalJoinRule` then plans into the versioned-join
 * state operator. An unrewritten marker fails at execution, as the
 * reference errors on an unconverted snapshot — never silent fallback.
 *
 * The versioned side's (time, seq) columns come from [[registerVersioned]]
 * — the analog of the reference's versioned-table metadata (event-time
 * WATERMARK + PRIMARY KEY on the dim table's DDL), which Flink likewise
 * resolves from the catalog rather than the query text.
 */
object TemporalSql {

  private val versioned = TrieMap.empty[String, (String, String)]
  private val versionedKey = TrieMap.empty[String, String]

  /** Declare `view` as a versioned table: `timeCol` is its event-time
   * version column, `seqCol` a monotonic tiebreaker (primary-key-ish)
   * for same-instant versions. */
  def registerVersioned(view: String, timeCol: String, seqCol: String): Unit =
    versioned.put(view.toLowerCase, (timeCol, seqCol))

  /** Keyed variant: also declares the PRIMARY KEY column, which the
   * PROC-TIME form (`FOR SYSTEM_TIME AS OF PROCTIME()`) needs to
   * resolve each key's latest version (the reference reads it from the
   * dim table's `PRIMARY KEY` DDL clause). */
  def registerVersioned(view: String, timeCol: String, seqCol: String,
      keyCol: String): Unit = {
    registerVersioned(view, timeCol, seqCol)
    versionedKey.put(view.toLowerCase, keyCol)
  }

  // ... <dim> FOR SYSTEM_TIME AS OF <probeTimeRef> [AS] <alias> ...
  private val ForSystemTime =
    """(?is)([A-Za-z_][A-Za-z0-9_]*)\s+FOR\s+SYSTEM_TIME\s+AS\s+OF\s+([A-Za-z_][A-Za-z0-9_.]*)\s+(?:AS\s+)?([A-Za-z_][A-Za-z0-9_]*)""".r

  // ... <dim> FOR SYSTEM_TIME AS OF PROCTIME() [AS] <alias> ...
  private val ForSystemTimeProc =
    """(?is)([A-Za-z_][A-Za-z0-9_]*)\s+FOR\s+SYSTEM_TIME\s+AS\s+OF\s+PROCTIME\s*\(\s*\)\s+(?:AS\s+)?([A-Za-z_][A-Za-z0-9_]*)""".r

  /** Desugar every `FOR SYSTEM_TIME AS OF` clause in `query` into the
   * marker-conjunct form above (pure text-to-text).
   *
   * The PROC-TIME form (`AS OF PROCTIME()`, reference
   * `TemporalProcessTimeJoinOperator` semantics: every probe joins the
   * dim's CURRENT version) desugars first, into a latest-version
   * derived table — a per-key NOT EXISTS that Catalyst plans as an
   * anti join against the newer-version set; no probe-side time takes
   * part, exactly the lookup-against-latest semantics. */
  def desugar(query: String): String = {
    var out = query
    var pm = ForSystemTimeProc.findFirstMatchIn(out)
    while (pm.isDefined) {
      val mm = pm.get
      val (table, alias) = (mm.group(1), mm.group(2))
      val (timeCol, seqCol) = versioned.getOrElse(table.toLowerCase,
        throw new IllegalArgumentException(
          s"'$table FOR SYSTEM_TIME AS OF PROCTIME()': no versioned registration for '$table'"))
      val keyCol = versionedKey.getOrElse(table.toLowerCase,
        throw new IllegalArgumentException(
          s"'$table FOR SYSTEM_TIME AS OF PROCTIME()': no PRIMARY KEY registered — " +
          "use TemporalSql.registerVersioned(view, timeCol, seqCol, keyCol)"))
      val latest =
        s"""(SELECT * FROM $table __cur WHERE NOT EXISTS (
           |  SELECT 1 FROM $table __newer
           |  WHERE __newer.$keyCol = __cur.$keyCol
           |    AND (__newer.$timeCol > __cur.$timeCol
           |         OR (__newer.$timeCol = __cur.$timeCol
           |             AND __newer.$seqCol > __cur.$seqCol)))) AS $alias""".stripMargin
      out = out.substring(0, mm.start) + latest + out.substring(mm.end)
      pm = ForSystemTimeProc.findFirstMatchIn(out)
    }
    var m = ForSystemTime.findFirstMatchIn(out)
    while (m.isDefined) {
      val mm = m.get
      val (table, probeTs, alias) = (mm.group(1), mm.group(2), mm.group(3))
      val (timeCol, seqCol) = versioned.getOrElse(table.toLowerCase,
        throw new IllegalArgumentException(
          s"'$table FOR SYSTEM_TIME AS OF': no versioned registration for " +
          s"'$table' — call TemporalSql.registerVersioned(view, timeCol, seqCol) " +
          "(the versioned-table DDL metadata)"))
      // find this join's ON clause and append the marker conjunct
      val after = out.substring(mm.end)
      val onRe = """(?is)^\s*ON\s+""".r
      val on = onRe.findFirstMatchIn(after).getOrElse(
        throw new IllegalArgumentException(
          s"'$table FOR SYSTEM_TIME AS OF' must be followed by ON <condition>"))
      val condStart = mm.end + on.end
      val condEnd = endOfCondition(out, condStart)
      val marker =
        s" AND SYSTEM_TIME_AS_OF($alias.$timeCol, $alias.$seqCol, $probeTs)"
      out = out.substring(0, mm.start) + s"$table AS $alias" +
        after.substring(0, on.end) +
        "(" + out.substring(condStart, condEnd) + marker + ")" +
        out.substring(condEnd)
      m = ForSystemTime.findFirstMatchIn(out)
    }
    out
  }

  /** The ON condition extends to the next top-level clause keyword,
   * unbalanced ')', or end of text — [[SqlLexer.regionEnd]] handles the
   * quote-awareness and word boundaries (an identifier like `cleft`
   * must not surface `LEFT`). */
  private def endOfCondition(s: String, start: Int): Int =
    SqlLexer.regionEnd(s, start, Seq("WHERE", "GROUP BY", "ORDER BY",
      "HAVING", "LIMIT", "UNION", "JOIN", "LEFT", "RIGHT", "FULL",
      "INNER", "CROSS", "WINDOW"))

  /** Parse + analyze + temporal-join-rewrite + wrap: the full SQL entry
   * point. Works whether or not `GraftExtensions` is installed on the
   * session (the rule is applied post-hoc here if analysis left the
   * marker in place). */
  def sql(spark: SparkSession, query: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val analyzed = spark.sql(desugar(query)).queryExecution.analyzed
    val rewritten = graft.rules.StreamTemporalJoinRule(spark)(analyzed)
    val leftover = rewritten.collectFirst {
      case p if p.expressions.exists(_.exists(_.isInstanceOf[graft.functions.SystemTimeAsOf])) => p
    }
    require(leftover.isEmpty,
      s"FOR SYSTEM_TIME AS OF join was not planned (unsupported shape):\n$leftover")
    org.apache.spark.sql.graft.SqlShim.ofRows(spark, rewritten)
  }
}
