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
/** The reference's UNTYPED scalar-function base
 * (`flink-table-common/.../functions/ScalarFunction.java:56`): the
 * subclass declares one public `eval` method whose signature is
 * discovered by reflection — the form `CREATE FUNCTION … AS 'class'`
 * instantiates. Supported eval parameter/return types: String, Long,
 * Int, Double, Boolean (the SQL-facing primitives). */
abstract class ScalarFunction extends Serializable

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

  private def sparkTypeOf(c: Class[_]): org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    c match {
      case x if x == classOf[String] => StringType
      case x if x == classOf[Long] || x == classOf[java.lang.Long] => LongType
      case x if x == classOf[Int] || x == classOf[java.lang.Integer] => IntegerType
      case x if x == classOf[Double] || x == classOf[java.lang.Double] => DoubleType
      case x if x == classOf[Boolean] || x == classOf[java.lang.Boolean] => BooleanType
      case other => throw new IllegalArgumentException(
        s"unsupported eval type ${other.getName} (use String/Long/Int/Double/Boolean)")
    }
  }

  /** Reflective registration for `CREATE FUNCTION name AS 'class'`
   * (reference SqlCreateFunction → FunctionCatalog.registerFunction,
   * with eval-method discovery as in
   * `UserDefinedFunctionHelper.validateClass`): instantiate the class,
   * find its single public `eval`, and register a Spark UDF of the
   * matching arity with the return type mapped from the signature. */
  def registerReflective(spark: SparkSession, name: String, className: String): Unit = {
    val clazz =
      try Class.forName(className)
      catch { case _: ClassNotFoundException =>
        throw new IllegalArgumentException(
          s"CREATE FUNCTION $name: class $className not found") }
    val evals = clazz.getMethods.filter(_.getName == "eval")
    require(evals.length == 1,
      s"CREATE FUNCTION $name: expected exactly one public eval method on $className, found ${evals.length}")
    val m = evals.head
    // instantiate once on the driver to fail fast on bad constructors
    clazz.getDeclaredConstructor().newInstance()
    val ret = sparkTypeOf(m.getReturnType)
    // Method/instance are not serializable — the executor-side wrapper
    // re-resolves them lazily from the class name (the class travels in
    // the application jar, as a reference UDF jar would)
    val callRef = new ReflectiveEval(className)
    m.getParameterCount match {
      case 1 => spark.udf.register(name,
        new org.apache.spark.sql.api.java.UDF1[AnyRef, Any] {
          def call(a: AnyRef): Any = callRef(a)
        }, ret)
      case 2 => spark.udf.register(name,
        new org.apache.spark.sql.api.java.UDF2[AnyRef, AnyRef, Any] {
          def call(a: AnyRef, b: AnyRef): Any = callRef(a, b)
        }, ret)
      case 3 => spark.udf.register(name,
        new org.apache.spark.sql.api.java.UDF3[AnyRef, AnyRef, AnyRef, Any] {
          def call(a: AnyRef, b: AnyRef, c: AnyRef): Any = callRef(a, b, c)
        }, ret)
      case n => throw new IllegalArgumentException(
        s"CREATE FUNCTION $name: eval arity $n not supported (1-3)")
    }
  }
}

/** Serializable holder for a reflective eval call: only the class name
 * crosses the wire; instance and Method re-resolve once per executor
 * JVM. */
private[api] final class ReflectiveEval(className: String) extends Serializable {
  @transient private lazy val inst: AnyRef =
    Class.forName(className).getDeclaredConstructor().newInstance().asInstanceOf[AnyRef]
  @transient private lazy val m: java.lang.reflect.Method =
    inst.getClass.getMethods.filter(_.getName == "eval").head
  @transient private lazy val primitiveParam: Array[Boolean] =
    m.getParameterTypes.map(_.isPrimitive)
  def apply(args: AnyRef*): Any = {
    // SQL null-in → null-out when the eval parameter is a primitive
    // (Method.invoke cannot unbox null; the reference's codegen applies
    // the same strict-null short-circuit for primitive eval args)
    var i = 0
    while (i < args.length) {
      if (args(i) == null && primitiveParam(i)) return null
      i += 1
    }
    m.invoke(inst, args: _*)
  }
}
