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

  test("label propagation adopts the most frequent neighbor label, ties to greater") {
    import spark.implicits._
    // 4 is adjacent to 1, 2, 3 (labels 1,2,3 — all frequency 1): the
    // reference breaks ties by the GREATER label, so 4 adopts 3.
    val v = Seq(1L, 2L, 3L, 4L).toDF("id")
    val e = Seq((1L, 4L), (2L, 4L), (3L, 4L)).toDF("src", "dst")
    val r1 = Pregel.labelPropagationMostFrequent(v, e, rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(r1(4L) == 3L)
    // leaves all see only the hub: they adopt 4's label
    assert(r1(1L) == 4L && r1(2L) == 4L && r1(3L) == 4L)

    // frequency beats magnitude. K(2,2) on {3,4}x{1,2} plus edge 1-2:
    // round 1 gives 3 and 4 both label 2 (tie over {1,2}), and 1 and 2
    // both label 4 (tie over {3,4,other-leaf}); round 2 vertex 1 sees
    // labels {2, 2, 4} — frequency 2 beats the GREATER but rarer 4.
    val v2 = Seq(1L, 2L, 3L, 4L).toDF("id")
    val e2 = Seq((3L, 1L), (3L, 2L), (4L, 1L), (4L, 2L), (1L, 2L)).toDF("src", "dst")
    val r2 = Pregel.labelPropagationMostFrequent(v2, e2, rounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(r2(1L) == 2L)
  }

  test("community detection: summed label scores win, changed labels attenuate") {
    import spark.implicits._
    // hub 4 adjacent to 1, 2, 3 — all scores 1e6, all labels distinct:
    // summed-score ties break to the SMALLEST label (reference TreeMap
    // ascending + strict greater), so 4 adopts 1 (unlike plain label
    // propagation, which ties to the GREATER label)
    val v = Seq(1L, 2L, 3L, 4L).toDF("id")
    val e = Seq((1L, 4L), (2L, 4L), (3L, 4L)).toDF("src", "dst")
    val r = Pregel.communityDetection(v, e, rounds = 1)
      .as[(Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    // 4 changed label -> score = best (1e6) minus delta/1 (5e5)
    assert(r(4L) == ((1L, 500000L)))
    // leaves adopt the hub's label with the same attenuation
    assert(r(1L) == ((4L, 500000L)) && r(3L) == ((4L, 500000L)))

    // keeping the label skips attenuation: 1-2 pair, round 2
    val v2 = Seq(1L, 2L).toDF("id")
    val e2 = Seq((1L, 2L)).toDF("src", "dst")
    val r2 = Pregel.communityDetection(v2, e2, rounds = 2)
      .as[(Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    // round 1: 1 adopts 2 (-5e5), 2 adopts 1 (-5e5); round 2: they swap
    // back to their OWN labels — a changed label again, minus 250000
    assert(r2(1L) == ((1L, 250000L)) && r2(2L) == ((2L, 250000L)))
  }

  test("HITS: authorities are pointed-to, hubs point at authorities, max scales to 1e9") {
    import spark.implicits._
    // 1 and 2 are hubs linking to authorities 3 and 4; 2 also links 5
    val e = Seq((1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (2L, 5L)).toDF("src", "dst")
    val r = Pregel.hitsFixed(e, rounds = 2)
      .as[(Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    // 3 and 4 are the strongest authorities (pointed to by both hubs)
    assert(r(3L)._2 == 1000000000L && r(4L)._2 == 1000000000L)
    assert(r(5L)._2 < r(3L)._2 && r(5L)._2 > 0)
    // 2 is the strongest hub (links 3 authorities)
    assert(r(2L)._1 == 1000000000L && r(1L)._1 < r(2L)._1 && r(1L)._1 > 0)
    // pure authorities have zero hubbiness; pure hubs zero authority
    assert(r(3L)._1 == 0L && r(1L)._2 == 0L)
  }

  test("jaccard index counts shared and distinct neighbors exactly") {
    import spark.implicits._
    // square 1-2-3-4-1: opposite corners share BOTH neighbors
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val r = Pregel.jaccardIndex(e)
      .as[(Long, Long, Long, Long)].collect()
      .map(t => (t._1, t._2) -> ((t._3, t._4))).toMap
    // 1 and 3 share {2, 4}: shared=2, union=2 -> jaccard 1.0
    assert(r((1L, 3L)) == ((2L, 2L)))
    assert(r((2L, 4L)) == ((2L, 2L)))
    // adjacent corners (e.g. 1,2) share nothing -> no row
    assert(!r.contains((1L, 2L)))
  }

  test("mediator-degree cap prunes super-hub wedges, keeps full degrees in denom") {
    import spark.implicits._
    // star center 9 links 1..4 (degree 4 — over the cap of 3); 1 and 2
    // also share the small mediator 10 (degree 2)
    val e = Seq((1L, 9L), (2L, 9L), (3L, 9L), (4L, 9L), (1L, 10L), (2L, 10L))
      .toDF("src", "dst")
    val r = Pregel.jaccardIndex(e, maxMediatorDegree = 3L)
      .as[(Long, Long, Long, Long)].collect()
      .map(t => (t._1, t._2) -> ((t._3, t._4))).toMap
    // 3,4 share only the capped hub -> pruned entirely
    assert(!r.contains((3L, 4L)))
    // 1,2 keep the small mediator; denom uses FULL degrees (2 + 2 - 1)
    assert(r((1L, 2L)) == ((1L, 3L)))
    val aa = Pregel.adamicAdar(e, maxMediatorDegree = 3L)
      .as[(Long, Long, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(!aa.contains((3L, 4L)))
    assert(aa((1L, 2L)) == math.floor(1e7 / math.log(2)).toLong)
  }

  test("adamic-adar weights common neighbors by 1/ln(degree), quantized") {
    import spark.implicits._
    // 1 and 2 share z=10 (degree 2) and z=20 (degree 3: also joins 3)
    val e = Seq((1L, 10L), (2L, 10L), (1L, 20L), (2L, 20L), (3L, 20L))
      .toDF("src", "dst")
    val r = Pregel.adamicAdar(e)
      .as[(Long, Long, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap
    val expected = math.floor(1e7 / math.log(2)).toLong +
      math.floor(1e7 / math.log(3)).toLong
    assert(r((1L, 2L)) == expected)
    // 1,3 and 2,3 share only z=20
    assert(r((1L, 3L)) == math.floor(1e7 / math.log(3)).toLong)
  }

  test("clustering coefficients and triad census on a known graph") {
    import spark.implicits._
    // triangle 1-2-3 plus pendant 3-4: degrees 1:2, 2:2, 3:3, 4:1
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("src", "dst")
    val local = Pregel.localClustering(e)
      .as[(Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(local(1L) == ((2L, 1L, 1L))) // deg 2, 1 triangle, 1 pair -> cc 1.0
    assert(local(3L) == ((3L, 1L, 3L))) // deg 3, 1 triangle, 3 pairs -> cc 1/3
    assert(local(4L) == ((1L, 0L, 0L))) // pendant: no pairs
    val g = Pregel.globalClustering(e).as[(Long, Long)].collect().head
    assert(g == ((5L, 1L))) // W = 1+1+3+0 = 5 triplets, 1 triangle
    val census = Pregel.triadCensus(e).as[(Long, Long, Long, Long)].collect().head
    // n=4, m=4, W=5, T=1: c30=1, c21=5-3=2, c12=m(n-2)-2*2-3*1=8-7=1,
    // c03=C(4,3)-1-2-1=0
    assert(census == ((0L, 1L, 2L, 1L)))
  }

  test("vertex metrics: counts, triplets, max degree on a known graph") {
    import spark.implicits._
    // star 0-{1,2,3} plus edge 1-2: degrees 0:3, 1:2, 2:2, 3:1
    val e = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L)).toDF("src", "dst")
    val m = Pregel.vertexMetrics(e)
      .as[(Long, Long, Long, Long)].collect().head
    assert(m == ((4L, 4L, 5L, 3L))) // 4 vertices, 4 edges, 3+1+1+0 triplets, max deg 3
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
