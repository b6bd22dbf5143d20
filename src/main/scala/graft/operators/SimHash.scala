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
 * Scale: word-count map phase (1 shuffle), a constant 16× fan-out, and
 * two hash aggregations — linear in corpus size, no pairwise work.
 */
object SimHash {

  val Bits = 16

  /** (id, simhash) — a BIGINT in [0, 2^16). */
  def apply(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val wc = df
      .select(col(idCol).as("doc"),
        explode(split(trim(lower(col(textCol))), " ")).as("word"))
      .groupBy(col("doc"), col("word"))
      .agg(count(lit(1)).as("cnt"))
    wc.withColumn("j", explode(sequence(lit(1), lit(Bits))))
      .withColumn("sgn",
        expr("CASE WHEN instr('89abcdef', substr(md5(word), j, 1)) > 0 THEN cnt ELSE -cnt END"))
      .groupBy(col("doc"), col("j"))
      .agg(sum(col("sgn")).as("s"))
      .withColumn("bit", expr("CASE WHEN s >= 0 THEN CAST(pow(2, j - 1) AS BIGINT) ELSE 0 END"))
      .groupBy(col("doc"))
      .agg(sum(col("bit")).as("simhash"))
  }
}
