package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * MinHash + banded LSH near-duplicate detection over a text column.
 *
 * Pipeline (each step a distributed, shuffle-bounded DataFrame op):
 *   1. shingle: word n-grams per doc (distinct)           — narrow + 1 shuffle (distinct)
 *   2. signature: k min-hashes per doc (salted md5; a string min is a
 *      valid min-hash under the random permutation induced by the hash) — 1 shuffle (groupBy doc)
 *   3. bands: one posexplode projection over the signature row — no
 *      union, no signature recompute                       — narrow
 *   4. candidates: docs sharing a band key                 — 1 shuffle (self-join on band key)
 *   5. verify: exact Jaccard over shingle sets for candidates only      — joins on (doc, shingle)
 *
 * The shingle frame is persisted (MEMORY_AND_DISK) because signatures,
 * both verify joins, and the size aggregate all consume it; without the
 * persist it is recomputed four times, including its distinct shuffle.
 *
 * Scale rationale: this is the standard 100-TB dedup shape — candidate
 * generation touches only (band-key, doc) pairs, never the O(n²) doc
 * cross product; verification joins are bounded by candidate count.
 * Banding keys are hash-distributed, so hot buckets (boilerplate docs)
 * are the only skew source — mitigable with AQE skew join, and the
 * band-key join is an equi-join AQE understands.
 *
 * All hashing is md5-based and engine-portable (the DuckDB oracle
 * reproduces it exactly); no RNG, no seed state.
 */
object MinHashLSH {

  /** Distinct word n-gram shingles: (id, shingle). The words array is
   * materialized once per row — splitting inside the lambda would
   * re-split per shingle index (O(words²) string work). */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    df.select(col(idCol).as("doc"),
        split(trim(lower(col(textCol))), " ").as("__w"))
      .select(col("doc"),
        explode(expr(
          s"""transform(
                sequence(1, greatest(size(__w) - ${n - 1}, 1)),
                i -> concat_ws(' ', slice(__w, i, $n)))"""))
          .as("shingle"))
      .distinct()
  }

  /** k salted min-hash signature columns h1..hk per doc. */
  def signatures(sh: DataFrame, k: Int): DataFrame = {
    val mins = (1 to k).map(i => min(md5(concat(lit(s"$i:"), col("shingle")))).as(s"h$i"))
    sh.groupBy(col("doc")).agg(mins.head, mins.tail: _*)
  }

  /** (doc, band, key) via one posexplode projection — band key = concat
   * of the band's signature slice. No union, signature computed once. */
  def bands(sig: DataFrame, k: Int, b: Int): DataFrame = {
    require(k % b == 0, "bands must divide signature length")
    val per = k / b
    val bandKeys: Seq[Column] = (1 to b).map { bi =>
      concat(((bi - 1) * per + 1 to bi * per).map(i => col(s"h$i")): _*)
    }
    sig.select(col("doc"), posexplode(array(bandKeys: _*)))
      .select(col("doc"), (col("pos") + 1).as("band"), col("col").as("key"))
  }

  /** Distinct candidate pairs (doc_a < doc_b) sharing any band key. */
  def candidatePairs(bandDf: DataFrame): DataFrame = {
    val a = bandDf.select(col("band"), col("key"), col("doc").as("doc_a"))
    val b = bandDf.select(col("band"), col("key"), col("doc").as("doc_b"))
    a.join(b, Seq("band", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
  }

  /** Exact Jaccard verification of candidates; keeps pairs >= threshold.
   * The threshold compare is integer cross-multiplication
   * (ninter * 1000 >= num * union) — exact, no float boundary;
   * `jaccard` is rounded only for output. The intersection joins carry
   * an 8-byte xxhash64 of the shingle instead of the shingle string —
   * far fewer shuffled bytes; set semantics are unchanged (a 64-bit
   * collision within one doc pair's shingle sets is negligible). */
  def verifiedPairs(sh: DataFrame, cand: DataFrame, threshold: Double): DataFrame = {
    val num = math.round(threshold * 1000)
    val shh = sh.select(col("doc"), xxhash64(col("shingle")).as("sh64"))
    val sizes = shh.groupBy(col("doc")).agg(count(lit(1)).as("n"))
    val inter = cand
      .join(shh.select(col("doc").as("doc_a"), col("sh64")), Seq("doc_a"))
      .join(shh.select(col("doc").as("doc_b"), col("sh64")), Seq("doc_b", "sh64"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("ninter"))
    inter
      .join(sizes.select(col("doc").as("doc_a"), col("n").as("na")), Seq("doc_a"))
      .join(sizes.select(col("doc").as("doc_b"), col("n").as("nb")), Seq("doc_b"))
      .filter(col("ninter") * 1000 >= (col("na") + col("nb") - col("ninter")) * num)
      .select(col("doc_a"), col("doc_b"),
        round(col("ninter") * lit(1.0) / (col("na") + col("nb") - col("ninter")), 4).as("jaccard"))
  }

  /** Full pipeline: near-dup pairs with verified Jaccard >= threshold. */
  def apply(df: DataFrame, idCol: String, textCol: String,
            shingleN: Int = 3, numHashes: Int = 8, numBands: Int = 4,
            threshold: Double = 0.5): DataFrame = {
    val sh = shingles(df, idCol, textCol, shingleN).persist(StorageLevel.MEMORY_AND_DISK)
    val cand = candidatePairs(bands(signatures(sh, numHashes), numHashes, numBands))
    verifiedPairs(sh, cand, threshold)
  }
}
