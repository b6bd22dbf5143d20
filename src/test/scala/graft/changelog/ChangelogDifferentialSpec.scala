package graft.changelog

import graft.SparkSuite

/** One changelog row of the fuzzer's CDC history. `seq` is the op
 * index; the -U/+U pair of one update SHARES a seq (the toChangelog
 * convention), exercising normalize's after-image-wins tiebreak. */
case class CRow(key: Long, grp: String, cents: Long, seq: Long, row_kind: String)

/** A versioned-table row for the toChangelog round-trip case. */
case class VRow(key: Long, version: Long, grp: String, cents: Long)

/** Differential fuzzer for the changelog layer (reference
 * `StreamExecChangelogNormalize.java:61` + the retract() path of its
 * aggregate functions): random per-key op histories — insert, update
 * (group may MOVE), delete, re-insert after delete — are interpreted
 * three ways and must agree at every checked prefix:
 *
 *  1. `ChangelogOps.normalize` == a plain Scala replay's final images
 *     (the upsert materialization every sink performs);
 *  2. `ChangelogOps.aggregateChangelog` == COUNT/SUM over those
 *     images per group — i.e. signed accumulation over the raw
 *     changelog, group-moving retractions included, equals the batch
 *     answer over latest images;
 *  3. `toChangelog` of a random versioned table round-trips through
 *     normalize back to the table's latest version per key.
 *
 * Like the other differentials, the oracle is an independent
 * formulation (driver-side replay / Spark's own batch path), not a
 * hand-computed expectation. */
class ChangelogDifferentialSpec extends SparkSuite {

  private val grps = Vector("g0", "g1", "g2")

  test("normalize and signed aggregate equal the replayed image at every prefix") {
    val rnd = new scala.util.Random(20260815L)
    for (case_ <- 0 until 8) {
      val nKeys = 2 + rnd.nextInt(5)
      val nOps = 30 + rnd.nextInt(40)
      val live = scala.collection.mutable.Map.empty[Long, (String, Long)]
      val rows = Vector.newBuilder[CRow]
      val opEnds = Vector.newBuilder[Long] // last seq of each op (prefix boundaries)
      for (seq <- 0 until nOps) {
        val key = rnd.nextInt(nKeys).toLong
        val grp = grps(rnd.nextInt(grps.size))
        val cents = (rnd.nextInt(2000) - 500).toLong // negative sums too
        live.get(key) match {
          case None =>
            rows += CRow(key, grp, cents, seq, RowKind.Insert)
            live(key) = (grp, cents)
          case Some((og, oc)) if rnd.nextInt(4) == 0 =>
            rows += CRow(key, og, oc, seq, RowKind.Delete)
            live.remove(key)
          case Some((og, oc)) =>
            rows += CRow(key, og, oc, seq, RowKind.UpdateBefore)
            rows += CRow(key, grp, cents, seq, RowKind.UpdateAfter)
            live(key) = (grp, cents)
        }
        opEnds += seq.toLong
      }
      val all = rows.result()
      val df = spark.createDataFrame(all)

      // the full history plus two random interior prefixes
      val bounds = opEnds.result()
      val checkAt = Seq(bounds.last) ++
        Seq.fill(2)(bounds(rnd.nextInt(bounds.size)))
      for (upTo <- checkAt.distinct) {
        val slice = df.filter(org.apache.spark.sql.functions.col("seq") <= upTo)
        // independent replay of the same prefix
        val img = scala.collection.mutable.Map.empty[Long, (String, Long)]
        all.filter(_.seq <= upTo).foreach { r =>
          r.row_kind match {
            case RowKind.Insert | RowKind.UpdateAfter => img(r.key) = (r.grp, r.cents)
            case RowKind.Delete => img.remove(r.key)
            case RowKind.UpdateBefore => // pre-image: no state change
          }
        }
        val gotImage = ChangelogOps.normalize(slice, Seq("key"), "seq")
          .collect().map(r => (r.getAs[Long]("key"),
            (r.getAs[String]("grp"), r.getAs[Long]("cents")))).toMap
        assert(gotImage == img.toMap,
          s"case $case_ prefix $upTo: normalize != replay\n got $gotImage\n exp $img")

        val expAgg = img.toSeq.groupBy(_._2._1)
          .map { case (g, ks) => g -> (ks.size.toLong, ks.map(_._2._2).sum) }
        val gotAgg = ChangelogOps.aggregateChangelog(slice, Seq("grp"), Seq("cents"))
          .collect().map(r => r.getAs[String]("grp") ->
            (r.getAs[Long]("n_rows"), r.getAs[Long]("sum_cents"))).toMap
        assert(gotAgg == expAgg,
          s"case $case_ prefix $upTo: signed aggregate != image aggregate\n" +
          s" got $gotAgg\n exp $expAgg")
      }
    }
  }

  test("toChangelog round-trips through normalize to the latest version per key") {
    val rnd = new scala.util.Random(20260816L)
    for (case_ <- 0 until 4) {
      val nKeys = 2 + rnd.nextInt(4)
      val rows = (0 until 20 + rnd.nextInt(20)).map { i =>
        VRow(rnd.nextInt(nKeys).toLong, i.toLong, grps(rnd.nextInt(grps.size)),
          rnd.nextInt(1000).toLong)
      }
      val df = spark.createDataFrame(rows)
      val cl = ChangelogOps.toChangelog(df, Seq("key"), "version")
      // every key's highest version wins
      val exp = rows.groupBy(_.key).map { case (k, vs) =>
        val last = vs.maxBy(_.version); k -> (last.grp, last.cents)
      }
      val got = ChangelogOps.normalize(cl, Seq("key"), "version")
        .collect().map(r => (r.getAs[Long]("key"),
          (r.getAs[String]("grp"), r.getAs[Long]("cents")))).toMap
      assert(got == exp, s"case $case_: round-trip lost images\n got $got\n exp $exp")
      // and the signed aggregate over the derived changelog matches too
      val expAgg = exp.toSeq.groupBy(_._2._1)
        .map { case (g, ks) => g -> (ks.size.toLong, ks.map(_._2._2).sum) }
      val gotAgg = ChangelogOps.aggregateChangelog(cl, Seq("grp"), Seq("cents"))
        .collect().map(r => r.getAs[String]("grp") ->
          (r.getAs[Long]("n_rows"), r.getAs[Long]("sum_cents"))).toMap
      assert(gotAgg == expAgg, s"case $case_: derived-changelog aggregate mismatch")
    }
  }
}
