package graft.functions.udfx

import graft.api.ScalarFunction

/**
 * Reference-style scalar function CLASSES for the `CREATE FUNCTION …
 * AS 'class'` DDL path (reference `SqlCreateFunction` +
 * `ScalarFunction.java:56` eval-by-reflection contract): each declares
 * one public `eval` whose signature the registration discovers
 * reflectively — exactly how a reference user ships a UDF jar.
 */

/** Strip vowels — 1-arg String → String. */
class VowelStrip extends ScalarFunction {
  def eval(s: String): String = if (s == null) null else s.replaceAll("[aeiou]", "")
}

/** Integer price band — 2-arg (Double, Long) → Long: which
 * `width`-cent band a price falls in, on the integer-cent grid. */
class CentsBand extends ScalarFunction {
  def eval(price: Double, width: Long): Long =
    Math.floorDiv(Math.floor(price * 100).toLong, width)
}
