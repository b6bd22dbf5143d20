package graft.api

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udf
import scala.collection.mutable.ArrayBuffer
import scala.reflect.runtime.universe.TypeTag

/**
 * The reference's user-function surface (SURVEY §2.10,
 * `flink-table-common/.../functions/`) re-expressed on Spark's own
 * extension points: ScalarFunction → registered UDF, TableFunction →
 * UDF returning rows + explode (a Generator at plan level),
 * AggregateFunction → typed `Aggregator`, TableAggregateFunction →
 * Aggregator emitting a row list + explode, AsyncTableFunction →
 * `AsyncLookup.mapAsyncOrdered` (see graft.operators).
 *
 * The facades keep the reference's method names (eval / accumulate /
 * merge / getValue / emitValue) so a reference user's function body
 * ports mechanically, while execution is 100% Spark (no new runtime).
 */
abstract class ScalarFunction1[I, O] extends Serializable { def eval(i: I): O }

abstract class ScalarFunction2[I1, I2, O] extends Serializable { def eval(a: I1, b: I2): O }

/** Emits 0..n rows per call through `collect`, like the reference's
 * `TableFunction.collect`. */
abstract class TableFunction1[I, T] extends Serializable {
  @transient private var buf: ArrayBuffer[T] = _
  protected final def collect(t: T): Unit = buf += t
  def eval(i: I): Unit
  final def invoke(i: I): Seq[T] = {
    buf = new ArrayBuffer[T]
    eval(i)
    buf.toSeq
  }
}

/** Reference-named typed aggregate: subclasses provide the four Flink
 * methods plus the two Spark encoders. */
abstract class AggregateFunction[IN, ACC, OUT] extends Aggregator[IN, ACC, OUT] {
  def createAccumulator(): ACC
  def accumulate(acc: ACC, in: IN): ACC
  def mergeAcc(a: ACC, b: ACC): ACC
  def getValue(acc: ACC): OUT
  final override def zero: ACC = createAccumulator()
  final override def reduce(acc: ACC, in: IN): ACC = accumulate(acc, in)
  final override def merge(a: ACC, b: ACC): ACC = mergeAcc(a, b)
  final override def finish(acc: ACC): OUT = getValue(acc)
}

/** Emits 0..n rows per GROUP (reference `TableAggregateFunction`, e.g.
 * Top2): finish() returns the emitted row list; explode it after agg. */
abstract class TableAggregateFunction[IN, ACC, OUT] extends Aggregator[IN, ACC, Seq[OUT]] {
  def createAccumulator(): ACC
  def accumulate(acc: ACC, in: IN): ACC
  def mergeAcc(a: ACC, b: ACC): ACC
  def emitValue(acc: ACC): Seq[OUT]
  final override def zero: ACC = createAccumulator()
  final override def reduce(acc: ACC, in: IN): ACC = accumulate(acc, in)
  final override def merge(a: ACC, b: ACC): ACC = mergeAcc(a, b)
  final override def finish(acc: ACC): Seq[OUT] = emitValue(acc)
}

object Udfs {
  /** Register a scalar function for SQL use (codegen note: a JVM UDF is
   * a black box to Catalyst — hot built-ins should instead be native
   * expressions, see graft.functions). */
  def register[I: TypeTag, O: TypeTag](spark: SparkSession, name: String,
      f: ScalarFunction1[I, O]): Unit =
    spark.udf.register(name, udf((i: I) => f.eval(i)))

  def register2[I1: TypeTag, I2: TypeTag, O: TypeTag](spark: SparkSession, name: String,
      f: ScalarFunction2[I1, I2, O]): Unit =
    spark.udf.register(name, udf((a: I1, b: I2) => f.eval(a, b)))

  /** Register a table function: SQL sees an array-returning function to
   * pair with LATERAL VIEW explode / posexplode. */
  def registerTable[I: TypeTag, T: TypeTag](spark: SparkSession, name: String,
      f: TableFunction1[I, T]): Unit =
    spark.udf.register(name, udf((i: I) => f.invoke(i)))
}
