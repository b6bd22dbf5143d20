package graft.streaming

import graft.SparkSuite
import graft.changelog.RowKind
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType
import java.nio.file.Files

/**
 * Upsert sink materializer semantics (reference
 * SinkUpsertMaterializer.java): per-batch snapshot merge keeps the
 * latest image per key, deletes remove keys, and STALE changes (a
 * sequence at or below the stored image's) never clobber a newer
 * image — the out-of-order case the reference's materializer exists
 * to solve.
 */
class UpsertSinkSpec extends SparkSuite {

  private val schema = StructType.fromDDL(
    "k BIGINT, seq BIGINT, v STRING, row_kind STRING")

  private def batchOf(rows: (Long, Long, String, String)*) =
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r => Row(r._1, r._2, r._3, r._4)): _*),
      schema)

  private def sinkRows(root: String): Set[(Long, Long, String)] =
    UpsertSink.read(spark, root, batchOf().drop("row_kind"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet

  test("insert, update, delete across batches materialize the latest image per key") {
    val root = Files.createTempDirectory("graft_upsert_spec").toString
    val apply = UpsertSink.foreachBatchUpsert(root, Seq("k"), "seq") _
    apply(batchOf((1L, 1L, "a", RowKind.Insert), (2L, 1L, "x", RowKind.Insert)), 0L)
    assert(sinkRows(root) === Set((1L, 1L, "a"), (2L, 1L, "x")))
    // batch 1: update k=1, delete k=2
    apply(batchOf((1L, 1L, "a", RowKind.UpdateBefore), (1L, 2L, "b", RowKind.UpdateAfter),
      (2L, 2L, "x", RowKind.Delete)), 1L)
    assert(sinkRows(root) === Set((1L, 2L, "b")))
  }

  test("a stale lower-sequence change never clobbers a newer stored image") {
    val root = Files.createTempDirectory("graft_upsert_spec2").toString
    val apply = UpsertSink.foreachBatchUpsert(root, Seq("k"), "seq") _
    apply(batchOf((7L, 5L, "new", RowKind.Insert)), 0L)
    // late-arriving older update and older delete — both must lose to
    // the stored seq=5 image
    apply(batchOf((7L, 3L, "old", RowKind.UpdateAfter), (7L, 4L, "old", RowKind.Delete)), 1L)
    assert(sinkRows(root) === Set((7L, 5L, "new")))
  }

  test("an EQUAL-sequence incoming change deterministically supersedes the stored image") {
    // the reference's materializer applies messages in arrival order:
    // a same-version message observed later wins
    val root = Files.createTempDirectory("graft_upsert_spec4").toString
    val apply = UpsertSink.foreachBatchUpsert(root, Seq("k"), "seq") _
    apply(batchOf((1L, 5L, "a", RowKind.Insert), (2L, 5L, "x", RowKind.Insert)), 0L)
    apply(batchOf((1L, 5L, "b", RowKind.UpdateAfter), (2L, 5L, "x", RowKind.Delete)), 1L)
    assert(sinkRows(root) === Set((1L, 5L, "b")))
  }

  test("replaying an already-committed batch rebuilds the identical snapshot") {
    // foreachBatch is at-least-once: a replay of batchId 1 must merge
    // against snap=0 (not against its own half-written output) and
    // converge to the same table
    val root = Files.createTempDirectory("graft_upsert_spec5").toString
    val apply = UpsertSink.foreachBatchUpsert(root, Seq("k"), "seq") _
    apply(batchOf((1L, 1L, "a", RowKind.Insert)), 0L)
    val b1 = batchOf((1L, 2L, "b", RowKind.UpdateAfter), (2L, 2L, "y", RowKind.Insert))
    apply(b1, 1L)
    val afterFirst = sinkRows(root)
    apply(b1, 1L) // replay
    assert(sinkRows(root) === afterFirst)
    assert(afterFirst === Set((1L, 2L, "b"), (2L, 2L, "y")))
  }

  test("empty batch commits a snapshot that preserves the table unchanged") {
    val root = Files.createTempDirectory("graft_upsert_spec3").toString
    val apply = UpsertSink.foreachBatchUpsert(root, Seq("k"), "seq") _
    apply(batchOf((1L, 1L, "a", RowKind.Insert)), 0L)
    apply(batchOf(), 1L)
    assert(UpsertSink.latestSnapshot(root).exists(_.endsWith("snap=000000001")))
    assert(sinkRows(root) === Set((1L, 1L, "a")))
  }
}
