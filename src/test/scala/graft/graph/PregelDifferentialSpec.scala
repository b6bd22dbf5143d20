package graft.graph

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Differential fuzzer for the Pregel loop: random graphs, the
 * distributed rounds (with their localCheckpoint/free machinery)
 * must equal an in-memory synchronous reference computed the simple
 * way. Two properties per graph:
 *  - minLabelPropagation after k rounds = exactly k synchronous
 *    min-exchange sweeps (round-for-round, not just at convergence);
 *  - with k >= diameter, labels = connected components (union-find). */
class PregelDifferentialSpec extends SparkSuite {

  private def syncMinRounds(n: Int, edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val adj = (edges ++ edges.map(e => (e._2, e._1))).distinct
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var lbl = (0L until n.toLong).map(v => v -> v).toMap
    for (_ <- 0 until rounds) {
      val next = lbl.map { case (v, l) =>
        val in = adj.getOrElse(v, Nil).map(lbl)
        v -> (l +: in).min
      }
      lbl = next
    }
    lbl
  }

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (0 until n).map(v => v.toLong -> find(v).toLong).toMap
  }

  test("random graphs: distributed min-label rounds equal the synchronous reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260815L)
    for (case_ <- 0 until 6) {
      val n = 20 + rnd.nextInt(40)
      val m = n / 2 + rnd.nextInt(n)
      val edges = Seq.fill(m) {
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).distinct
      val rounds = 1 + rnd.nextInt(4)
      val vDf = (0L until n.toLong).toDF("id")
      val eDf = edges.toDF("src", "dst")

      val got = Pregel.minLabelPropagation(vDf, eDf, rounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = syncMinRounds(n, edges, rounds)
      assert(got == want,
        s"case $case_ (n=$n m=${edges.size} rounds=$rounds) diverged from the sync reference")

      // at n rounds (>= any diameter) labels are the exact components
      val conv = Pregel.minLabelPropagation(vDf, eDf, math.min(n, 12))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val comps = unionFind(n, edges)
      // 12 rounds may fall short of a long path's diameter; only
      // assert equality when the sync reference has also converged
      val syncConv = syncMinRounds(n, edges, math.min(n, 12))
      assert(conv == syncConv, s"case $case_ convergence run diverged")
      if (syncConv == comps)
        assert(conv == comps, s"case $case_ converged labels are not the components")
    }
  }
}
