package graft.changelog

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** RowKind conventions: changelog derivation, delete handling, and the
 * normalize round-trip identity. */
class ChangelogSpec extends SparkSuite {

  test("toChangelog emits +I then -U/+U pairs per key in version order") {
    import spark.implicits._
    val t = Seq((1L, 1L, 10L), (1L, 2L, 20L), (1L, 3L, 30L), (2L, 1L, 5L))
      .toDF("k", "v", "x")
    val cl = ChangelogOps.toChangelog(t, Seq("k"), "v")
      .select("k", "v", "x", "row_kind").as[(Long, Long, Long, String)]
      .collect().toSet
    assert(cl == Set(
      (1L, 1L, 10L, "+I"), (2L, 1L, 5L, "+I"),
      (1L, 1L, 10L, "-U"), (1L, 2L, 20L, "+U"),
      (1L, 2L, 20L, "-U"), (1L, 3L, 30L, "+U")))
  }

  test("normalize keeps the latest after-image and drops deleted keys") {
    import spark.implicits._
    val cl = Seq(
      (1L, 1L, 10L, "+I"), (1L, 2L, 20L, "+U"), (1L, 1L, 10L, "-U"),
      (2L, 1L, 5L, "+I"), (2L, 2L, 5L, "-D"),
      (3L, 1L, 7L, "+I"))
      .toDF("k", "v", "x", "row_kind")
    val img = ChangelogOps.normalize(cl, Seq("k"), "v")
      .select("k", "v", "x").as[(Long, Long, Long)].collect().toSet
    assert(img == Set((1L, 2L, 20L), (3L, 1L, 7L)))
  }

  test("normalize ∘ toChangelog = keep-last image") {
    import spark.implicits._
    val t = Seq((1L, 3L, 30L), (1L, 1L, 10L), (2L, 9L, 90L), (2L, 4L, 40L))
      .toDF("k", "v", "x")
    val img = ChangelogOps.normalize(
        ChangelogOps.toChangelog(t, Seq("k"), "v"), Seq("k"), "v")
      .select("k", "v", "x").as[(Long, Long, Long)].collect().toSet
    assert(img == Set((1L, 3L, 30L), (2L, 9L, 90L)))
  }

  test("downstream aggregate retracts updates out of their old group") {
    import spark.implicits._
    // key 1 moves group a -> b (with a value change); key 2 stays in a;
    // key 3 is inserted into c then deleted
    val cl = Seq(
      (1L, "a", 10L, "+I"), (1L, "a", 10L, "-U"), (1L, "b", 25L, "+U"),
      (2L, "a", 7L, "+I"),
      (3L, "c", 99L, "+I"), (3L, "c", 99L, "-D"))
      .toDF("k", "grp", "x", "row_kind")
    val agg = ChangelogOps.aggregateChangelog(cl, Seq("grp"), Seq("x"))
      .select("grp", "n_rows", "sum_x").as[(String, Long, Long)].collect().toSet
    // group a: only key 2 remains; group b: key 1's latest; group c: gone
    assert(agg == Set(("a", 1L, 7L), ("b", 1L, 25L)))
  }
}
