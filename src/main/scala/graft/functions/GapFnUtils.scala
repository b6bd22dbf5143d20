package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Static runtime helpers invoked from generated code by the gap
 * expressions (`graft.functions.GapExpressions`). Top-level Scala
 * objects expose static forwarders, so `GapFnUtils.isDecimal(x)` is
 * valid Java in codegen'd sources.
 *
 * Semantics mirror the reference's string/JSON predicate functions
 * (`FlinkSqlOperatorTable.java:274-292` IS_DECIMAL/IS_DIGIT/IS_ALPHA,
 * `:1161-1171` IS JSON; `BuiltInFunctionDefinitions` SPLIT_INDEX),
 * re-implemented from their documented behavior.
 */
object GapFnUtils {

  /** Optional sign, then digits with at most one dot, at least one
   * digit overall. */
  def isDecimal(s: UTF8String): Boolean = {
    val str = s.toString
    var i = 0
    val n = str.length
    if (n == 0) return false
    if (str.charAt(0) == '+' || str.charAt(0) == '-') i = 1
    var digits = 0
    var dots = 0
    while (i < n) {
      val c = str.charAt(i)
      if (c >= '0' && c <= '9') digits += 1
      else if (c == '.') { dots += 1; if (dots > 1) return false }
      else return false
      i += 1
    }
    digits > 0
  }

  /** Non-empty and all ASCII digits. */
  def isDigit(s: UTF8String): Boolean = {
    val str = s.toString
    str.nonEmpty && str.forall(c => c >= '0' && c <= '9')
  }

  /** Non-empty and all letters. */
  def isAlpha(s: UTF8String): Boolean = {
    val str = s.toString
    str.nonEmpty && str.forall(Character.isLetter)
  }

  /** 0-based index into the literal-separator split of `str`; null when
   * out of range (the reference's SPLIT_INDEX contract). */
  def splitIndex(str: UTF8String, sep: UTF8String, index: Int): UTF8String = {
    if (index < 0) return null
    val s = str.toString
    val d = sep.toString
    if (d.isEmpty) return null
    var from = 0
    var i = 0
    while (true) {
      val at = s.indexOf(d, from)
      if (i == index) {
        val end = if (at < 0) s.length else at
        return UTF8String.fromString(s.substring(from, end))
      }
      if (at < 0) return null
      from = at + d.length
      i += 1
    }
    null
  }

  // FAIL_ON_TRAILING_TOKENS: '{"k":1}x' must be invalid, as in every
  // SQL engine's IS JSON — Jackson's default stops at the first token
  private val mapper = new ObjectMapper()
    .enable(com.fasterxml.jackson.databind.DeserializationFeature.FAIL_ON_TRAILING_TOKENS)

  private def parse(s: UTF8String): JsonNode =
    try mapper.readTree(s.toString)
    catch { case _: Exception => null }

  def isJsonValue(s: UTF8String): Boolean = parse(s) != null

  def isJsonObject(s: UTF8String): Boolean = {
    val n = parse(s); n != null && n.isObject
  }

  def isJsonArray(s: UTF8String): Boolean = {
    val n = parse(s); n != null && n.isArray
  }

  def isJsonScalar(s: UTF8String): Boolean = {
    val n = parse(s); n != null && !n.isObject && !n.isArray
  }
}
