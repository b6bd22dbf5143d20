package graft.operators

import graft.SparkSuite

/** Sampling: quota arithmetic pins for the deterministic samplers
 * (the oracle gates check full outputs; these pin the closed-form
 * quota math on hand-sized inputs). */
class SamplingSpec extends SparkSuite {
  test("temperatureMix quotas: sqrt-tempered, integer-exact") {
    import spark.implicits._
    val df = ((1 to 16).map(i => ("a", i.toLong)) ++ (1 to 4).map(i => ("b", 100L + i)))
      .toDF("k", "id")
    // w_a = floor(1e6·√16) = 4e6, w_b = 2e6, W = 6e6 → quotas 4 and 2
    val counts = Sampling.temperatureMix(df, "k", "id", total = 6)
      .groupBy("k").count().as[(String, Long)].collect().toMap
    assert(counts == Map("a" -> 4L, "b" -> 2L), s"got $counts")
  }

  test("temperatureMix upsamples the tail relative to proportional mixing") {
    import spark.implicits._
    // 900 vs 100: proportional gives the tail 10%; sqrt-tempered gives
    // w = 3e7 vs 1e7 → tail quota = 25% of the budget
    val df = ((1 to 900).map(i => ("head", i.toLong)) ++
      (1 to 100).map(i => ("tail", 10000L + i))).toDF("k", "id")
    val counts = Sampling.temperatureMix(df, "k", "id", total = 100)
      .groupBy("k").count().as[(String, Long)].collect().toMap
    assert(counts == Map("head" -> 75L, "tail" -> 25L), s"got $counts")
  }
}
