package graft.graph

import graft.SparkSuite

/** Graph loops on known small graphs. */
class PregelSpec extends SparkSuite {

  test("min-label propagation finds connected components within diameter rounds") {
    import spark.implicits._
    val v = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("id")
    // components: {1,2,3} (path), {4,5} (edge), {6} (isolated)
    val e = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("src", "dst")
    val labels = Pregel.minLabelPropagation(v, e, rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 6L))
  }

  test("pagerank: sink-free cycle converges to uniform; star center outranks leaves") {
    import spark.implicits._
    val cv = Seq(1L, 2L, 3L).toDF("id")
    val ce = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val cyc = Pregel.pageRank(cv, ce, iters = 10).as[(Long, Double)].collect().toMap
    assert(cyc.values.forall(r => math.abs(r - 1.0 / 3) < 1e-9))

    val sv = Seq(0L, 1L, 2L, 3L).toDF("id")
    // leaves point at the center and back (undirected star)
    val se = Seq((1L, 0L), (2L, 0L), (3L, 0L), (0L, 1L), (0L, 2L), (0L, 3L))
      .toDF("src", "dst")
    val star = Pregel.pageRank(sv, se, iters = 15).as[(Long, Double)].collect().toMap
    assert(star(0L) > star(1L))
    assert(math.abs(star(1L) - star(2L)) < 1e-12)
  }

  test("fixed-point pagerank: integer ranks track the float ranks and are symmetric") {
    import spark.implicits._
    val sv = Seq(0L, 1L, 2L, 3L).toDF("id")
    val se = Seq((1L, 0L), (2L, 0L), (3L, 0L), (0L, 1L), (0L, 2L), (0L, 3L))
      .toDF("src", "dst")
    val fixed = Pregel.pageRankFixed(sv, se, iters = 15).as[(Long, Long)].collect().toMap
    val float = Pregel.pageRank(sv, se, iters = 15).as[(Long, Double)].collect().toMap
    // leaves are exactly symmetric in integer arithmetic
    assert(fixed(1L) == fixed(2L) && fixed(2L) == fixed(3L))
    assert(fixed(0L) > fixed(1L))
    // within rounding distance of the float recurrence (flooring loses
    // at most a few units per step at scale 1e9)
    float.foreach { case (id, r) =>
      assert(math.abs(fixed(id) - r * 1e9) < 1e3, s"vertex $id: ${fixed(id)} vs $r")
    }
  }

  test("delta-iteration SSSP: BFS distances, early convergence, unreached excluded") {
    import spark.implicits._
    // path 1-2-3-4 plus a shortcut 1-4; 9-10 is a separate component
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (9L, 10L)).toDF("src", "dst")
    val d = Pregel.ssspDelta(e, sourceId = 1L, maxRounds = 10)
      .as[(Long, Long)].collect().toMap
    // shortcut wins for 4; the other component never enters the solution
    assert(d == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
    // maxRounds smaller than the eccentricity truncates the frontier
    val d2 = Pregel.ssspDelta(e, sourceId = 1L, maxRounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(d2 == Map(1L -> 0L, 2L -> 1L, 4L -> 1L))
  }

  test("iteration rounds free their checkpoint blocks eagerly") {
    import spark.implicits._
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    val v = (1L to 50L).toDF("id")
    val e = (1L until 50L).map(i => (i, i + 1)).toDF("src", "dst")
    val labels = Pregel.minLabelPropagation(v, e, rounds = 8)
    assert(labels.count() == 50)
    // 8 rounds ran; all dead rounds' blocks and the edge cache are
    // freed — only the RESULT's checkpoint RDD may stay resident
    val resident = spark.sparkContext.getPersistentRDDs
    assert(resident.size <= 1,
      s"dead iteration rounds still resident: ${resident.keys.toList.sorted}")
    val dist = Pregel.ssspDelta(e, sourceId = 1L, maxRounds = 60)
    assert(dist.count() == 50)
    val resident2 = spark.sparkContext.getPersistentRDDs
    assert(resident2.size <= 2, // labels result + dist result
      s"dead ssspDelta rounds still resident: ${resident2.keys.toList.sorted}")
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
  }
}
