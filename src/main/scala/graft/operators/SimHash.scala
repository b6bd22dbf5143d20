package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * SimHash document fingerprinting (16-bit, word-frequency weighted).
 *
 * Classic Charikar sketch: each word hashes to a bit pattern; each bit
 * position accumulates +freq when the word's hash bit is 1 and -freq
 * when 0; the fingerprint bit is 1 iff the accumulated sum is >= 0.
 * Near-duplicate docs differ in few bits (small Hamming distance).
 *
 * Engine-portable determinism: the per-word "hash bit j" is the high
 * bit of hex digit j of md5(word) — identical in any engine with md5.
 *
 * Scale: two shuffles total — the (doc, word) count aggregation and ONE
 * groupBy(doc) carrying all 16 bit positions as conditional sums in a
 * single aggregate (no 16× row fan-out, no per-bit shuffle). All work
 * is linear in corpus size; no pairwise comparisons.
 */
object SimHash {

  val Bits = 16

  /** (doc, simhash) — a BIGINT in [0, 2^16). */
  def apply(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val wc = df
      .select(col(idCol).as("doc"),
        explode(split(trim(lower(col(textCol))), " ")).as("word"))
      .groupBy(col("doc"), col("word"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("h", md5(col("word")))
    // one conditional sum per bit position, all in a single aggregate
    val sums = (1 to Bits).map { j =>
      sum(when(expr(s"instr('89abcdef', substr(h, $j, 1)) > 0"), col("cnt"))
        .otherwise(-col("cnt"))).as(s"s$j")
    }
    val fingerprint = (1 to Bits)
      .map(j => when(col(s"s$j") >= 0, lit(1L << (j - 1))).otherwise(lit(0L)))
      .reduce(_ + _)
    wc.groupBy(col("doc"))
      .agg(sums.head, sums.tail: _*)
      .select(col("doc"), fingerprint.as("simhash"))
  }
}
