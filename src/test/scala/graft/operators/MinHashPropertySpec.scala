package graft.operators

import graft.SparkSuite

/** Seeded property check for the MinHash + banded-LSH near-dup
 * pipeline: on a corpus with CONTROLLED duplicate structure (each base
 * doc paired with a variant at 0–3 changed words), the verified-pair
 * output must be exactly sound and complete over the candidate set
 * (integer cross-multiplied Jaccard threshold, checked against
 * in-test exact shingle sets), and every truly-high-similarity pair
 * (J ≥ 0.75 at k=12, b=6 bands ⇒ per-pair miss probability
 * (1−J²)⁶ < 1%) must survive candidate generation. Deterministic —
 * the hashing is salted md5 of fixed strings, no RNG at runtime. */
class MinHashPropertySpec extends SparkSuite {

  test("verified pairs are exact; high-similarity recall is total") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260817L)
    val vocab = (0 until 50).map(i => s"w$i")
    val docs = scala.collection.mutable.ListBuffer[(Int, List[String])]()
    for (i <- 0 until 30) {
      val ws = List.fill(15)(vocab(rnd.nextInt(vocab.size)))
      docs += ((i * 10, ws))
      val m = rnd.nextInt(4) // 0..3 words changed
      var vw = ws.toVector
      for (_ <- 0 until m)
        vw = vw.updated(rnd.nextInt(vw.size), vocab(rnd.nextInt(vocab.size)))
      docs += ((i * 10 + 1, vw.toList))
    }
    val df = docs.toSeq.map { case (id, ws) => (id, ws.mkString(" ")) }
      .toDF("id", "text")

    val sh = MinHashLSH.shingles(df, "id", "text", 2)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cand = MinHashLSH.candidatePairs(
      MinHashLSH.bands(MinHashLSH.signatures(sh, 12), 12, 6))
    val verified = MinHashLSH.verifiedPairs(sh, cand, 0.5)

    // in-test exact shingle sets, mirroring the operator's edge rule
    // (a doc shorter than n yields its whole text as one shingle)
    def shingleSet(ws: List[String]): Set[String] =
      if (ws.size < 2) Set(ws.mkString(" "))
      else ws.sliding(2).map(_.mkString(" ")).toSet
    val sets = docs.map { case (id, ws) => id -> shingleSet(ws) }.toMap

    val candSet = cand.collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    val verSet = verified.select("doc_a", "doc_b").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSet

    // 1. soundness + completeness over candidates at the integer
    //    cross-multiplied threshold (ninter·1000 ≥ 500·union)
    assert(verSet.subsetOf(candSet))
    for ((a, b) <- candSet) {
      val inter = (sets(a) & sets(b)).size
      val union = (sets(a) | sets(b)).size
      val keep = inter * 1000 >= 500 * union
      assert(verSet.contains((a, b)) == keep,
        s"pair ($a,$b): inter=$inter union=$union keep=$keep " +
          s"emitted=${verSet.contains((a, b))}")
    }

    // 2. recall: every true pair at J ≥ 0.75 must be a candidate
    val ids = docs.map(_._1).toList
    val hi = for {
      a <- ids; b <- ids if a < b
      inter = (sets(a) & sets(b)).size
      union = (sets(a) | sets(b)).size
      if inter * 100 >= 75 * union
    } yield (a, b)
    assert(hi.nonEmpty, "fixture produced no high-similarity pairs")
    for (p <- hi)
      assert(candSet.contains(p), s"high-similarity pair $p missed by LSH")

    // 3. the emitted jaccard column matches the exact value to 1e-4
    for (r <- verified.collect()) {
      val (a, b) = (r.getInt(0), r.getInt(1))
      val exact = (sets(a) & sets(b)).size.toDouble / (sets(a) | sets(b)).size
      assert(math.abs(r.getDouble(2) - exact) < 5e-5,
        s"pair ($a,$b): jaccard ${r.getDouble(2)} vs exact $exact")
    }
    sh.unpersist()
  }
}
