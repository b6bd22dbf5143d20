package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Bipartite projection property: random bipartite edge sets — the
 * self-join projection must equal the brute-force enumeration (one
 * edge per ordered distinct-top pair PER shared bottom, both edge
 * values carried), and the bottom projection is the same call with
 * the columns swapped. */
class BipartitePropertySpec extends SparkSuite {

  test("property: projection equals brute force; bottom = swapped call") {
    import spark.implicits._
    val rnd = new scala.util.Random(444L)
    for (case_ <- 0 until 5) {
      val edges = (1 to 15 + rnd.nextInt(25)).map(i =>
        (1L + rnd.nextInt(6), 100L + rnd.nextInt(5), i.toLong)).distinct
      val df = edges.toDF("top", "bot", "ev")

      val expectedTop = (for {
        (t1, b1, e1) <- edges; (t2, b2, e2) <- edges
        if b1 == b2 && t1 != t2
      } yield (t1, t2, b1, e1, e2)).toSet
      val gotTop = graft.graph.Bipartite.projectionTopSimple(df, "top", "bot", "ev")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(gotTop == expectedTop, s"case $case_: top projection diverged")

      val expectedBot = (for {
        (t1, b1, e1) <- edges; (t2, b2, e2) <- edges
        if t1 == t2 && b1 != b2
      } yield (b1, b2, t1, e1, e2)).toSet
      val gotBot = graft.graph.Bipartite.projectionTopSimple(df, "bot", "top", "ev")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(gotBot == expectedBot, s"case $case_: bottom projection diverged")
    }
  }
}
