package graft.api

import graft.SparkSuite
import graft.operators.AsyncLookup
import graft.queries.ExampleFns
import scala.concurrent.Future
import scala.concurrent.ExecutionContext.Implicits.global

/** UDF-surface facades + async I/O ordering guarantees. */
class UdfSurfaceSpec extends SparkSuite {

  test("AsyncLookup.mapAsyncOrdered preserves input order under variable latency") {
    import spark.implicits._
    val ds = spark.range(0, 200).as[Long]
    val out = AsyncLookup.mapAsyncOrdered(ds, parallelism = 16) { i =>
      Future { Thread.sleep((i % 7) * 2); i * 10 } // slower for some elements
    }.collect().toSeq
    assert(out == (0L until 200L).map(_ * 10))
  }

  test("AsyncLookup.mapAsyncUnordered emits every result; slow heads don't block") {
    import spark.implicits._
    val ds = spark.range(0, 100).coalesce(1).as[Long]
    val out = AsyncLookup.mapAsyncUnordered(ds, parallelism = 8) { i =>
      Future { if (i == 0) Thread.sleep(150); i * 10 } // head is the slowest
    }.collect().toSeq
    assert(out.toSet == (0L until 100L).map(_ * 10).toSet)
    // unordered mode emitted faster completions ahead of the slow head
    assert(out.head != 0L, "completion order should beat input order here")
  }

  test("async timeout: default fails the job, onTimeout emits the fallback") {
    import spark.implicits._
    import scala.concurrent.duration._
    val ds = spark.range(0, 3).coalesce(1).as[Long]
    // the never-completing promise is minted INSIDE the task (futures
    // cannot ride the serialized closure)
    def f(i: Long): Future[Long] =
      if (i == 1) scala.concurrent.Promise[Long]().future // completes... never
      else Future.successful(i * 10)
    // reference AsyncFunction#timeout default: the job fails
    val boom = intercept[org.apache.spark.SparkException] {
      AsyncLookup.mapAsyncOrdered(ds, parallelism = 4, timeout = 200.millis)(f).collect()
    }
    assert(boom.getMessage != null)
    // overridden timeout callback: per-input fallback, order preserved
    val out = AsyncLookup.mapAsyncOrdered(ds, parallelism = 4,
      timeout = 200.millis, onTimeout = Some((i: Long) => -i))(f).collect().toSeq
    assert(out == Seq(0L, -1L, 20L))
  }

  test("TableFunction collects 0..n rows per call with ordinal info") {
    val tf = new ExampleFns.WordsWithIdx
    assert(tf.invoke("a bb ccc") == Seq(("a", 0, 1), ("bb", 1, 2), ("ccc", 2, 3)))
    assert(tf.invoke("solo") == Seq(("solo", 0, 4)))
  }

  test("Top2 table aggregate emits ranked rows and merges partial accumulators") {
    val t = new ExampleFns.Top2
    val acc = Seq(5L, 9L, 1L, 7L).foldLeft(t.createAccumulator())(t.accumulate)
    assert(t.emitValue(acc) == Seq((9L, 1), (7L, 2)))
    val accA = Seq(3L, 8L).foldLeft(t.createAccumulator())(t.accumulate)
    val accB = Seq(10L, 2L).foldLeft(t.createAccumulator())(t.accumulate)
    assert(t.emitValue(t.mergeAcc(accA, accB)) == Seq((10L, 1), (8L, 2)))
    assert(t.emitValue(t.createAccumulator()) == Nil) // empty group: 0 rows
  }

  test("WeightedAvg aggregate is exact under partial merge") {
    val a = new ExampleFns.WeightedAvg
    val acc1 = a.accumulate(a.createAccumulator(), (2.0, 10.0))   // w=2, 1000c*2
    val acc2 = a.accumulate(a.createAccumulator(), (3.0, 20.0))   // w=3, 2000c*3
    assert(a.getValue(a.mergeAcc(acc1, acc2)) == (2000L + 6000L) / 5L)
  }
}
