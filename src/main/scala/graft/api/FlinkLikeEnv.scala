package graft.api

import graft.streaming.{Cep, CepBoundG, StatefulOps, StreamOps}
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}

import scala.reflect.runtime.universe.TypeTag

/**
 * FlinkLike fluent facade (SURVEY §7.1 `api/`) — the entry surface a
 * user of the reference reaches for first:
 * `env.fromDataset(...).keyBy(...).keepLast(...)` /
 * `.topN(...)` / `.cep(pattern)`, mirroring
 * `StreamExecutionEnvironment`, `DataStream.java:128` and
 * `KeyedStream.java`. Deliberately THIN: every method routes to the
 * operator objects (`streaming/StatefulOps`, `streaming/Cep`,
 * `sqlx/Ddl`, `sqlx/TemporalSql`, `sqlx/MatchRecognize`) — the facade
 * adds naming, not behavior, so the Catalyst plan is identical to
 * calling the operator directly. Batch `Dataset`s flow through the
 * same surface (the reference's DataSet/DataStream unification).
 */
/** Reference `SourceFunction<T>` (`flink-streaming-java/.../functions/
 * source/SourceFunction.java`): a single-task push loop emitting via
 * the context. The reference runs it at parallelism 1; here the
 * emitted elements distribute as a Dataset afterwards, so downstream
 * operators parallelize identically. Bounded sources only — unbounded
 * custom sources map to the DSv2 path (`sources/DatagenSource`). */
trait SourceFunction[T] {
  def run(ctx: SourceFunction.SourceContext[T]): Unit
}

object SourceFunction {
  trait SourceContext[T] { def collect(t: T): Unit }
}

final class StreamEnv private (val spark: SparkSession) {

  /** Wrap any typed Dataset — batch or streaming. */
  def fromDataset[T](ds: Dataset[T]): Stream[T] = new Stream(ds)

  /** Reference `env.fromElements(...)`. */
  def fromElements[T: Encoder](elems: T*): Stream[T] =
    fromCollection(elems)

  /** Reference `env.fromCollection(...)`. */
  def fromCollection[T: Encoder](data: Seq[T]): Stream[T] =
    new Stream(spark.createDataset(data))

  /** Reference `env.addSource(new SourceFunction<T>() {...})`: runs
   * the push loop (single-task, as the reference), then distributes
   * the emitted elements. */
  def addSource[T: Encoder](fn: SourceFunction[T]): Stream[T] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[T]
    fn.run(new SourceFunction.SourceContext[T] {
      def collect(t: T): Unit = buf += t
    })
    fromCollection(buf.toSeq)
  }

  /** Batch table from a testdata dir (reference `env.createInput`). */
  def fromTable(dir: String, name: String): DataFrame =
    graft.Tables.load(spark, dir, name)

  /** Unbounded file source over a testdata table (reference
   * `env.fromSource(FileSource...)`). */
  def fromFileSource(dir: String, name: String): DataFrame =
    StreamOps.readStream(spark, dir, name)

  /** The SQL/Table half (reference `StreamTableEnvironment.create`). */
  def tableEnv: TableEnv = new TableEnv(spark)
}

object StreamEnv {
  /** Reference `StreamExecutionEnvironment.getExecutionEnvironment`. */
  def get(spark: SparkSession): StreamEnv = new StreamEnv(spark)
}

/** Reference `DataStream<T>`: typed transforms; `keyBy` is available
 * for any case-class element type (see [[Stream.KeyedOps]]). */
final class Stream[T](val ds: Dataset[T]) {
  def map[U: Encoder](f: T => U): Stream[U] = new Stream(ds.map(f))
  def filter(p: T => Boolean): Stream[T] = new Stream(ds.filter(p))
  def flatMap[U: Encoder](f: T => IterableOnce[U]): Stream[U] =
    new Stream(ds.flatMap(f))
  def mapPartitions[U: Encoder](f: Iterator[T] => Iterator[U]): Stream[U] =
    new Stream(ds.mapPartitions(f))
  def union(other: Stream[T]): Stream[T] = new Stream(ds.union(other.ds))
  /** Two-input connect (reference `DataStream.connect` →
   * `ConnectedStreams.java:60`): pair this stream with one of a
   * DIFFERENT element type for CoFlatMap / keyed co-process. */
  def connect[U](other: Stream[U]): ConnectedStreams[T, U] =
    new ConnectedStreams(ds, other.ds)
  def toDF(): DataFrame = ds.toDF()
}

/** Reference `ConnectedStreams<IN1, IN2>`: the stateless CoFlatMap
 * pair and the keyed co-process with shared state, both routed to
 * `graft.streaming.ConnectedOps`. */
final class ConnectedStreams[A, B](val a: Dataset[A], val b: Dataset[B]) {
  /** Reference `CoFlatMapFunction`: flatMap1/flatMap2, one output. */
  def flatMap[O: Encoder](f1: A => IterableOnce[O],
      f2: B => IterableOnce[O]): Stream[O] =
    new Stream(graft.streaming.ConnectedOps.coFlatMap(a, b, f1, f2))
  /** Reference `CoMapFunction`: map1/map2, one output. */
  def map[O: Encoder](f1: A => O, f2: B => O): Stream[O] =
    new Stream(graft.streaming.ConnectedOps.coFlatMap(
      a, b, (x: A) => Seq(f1(x)), (y: B) => Seq(f2(y))))
  /** Reference `ConnectedStreams.keyBy(k1, k2)` +
   * `KeyedCoProcessFunction`: shared per-key state, event-time-ordered
   * delivery (first input wins timestamp ties); rows with id < 0 are
   * watermark carriers. */
  def keyedProcessOrdered[S, O](
      keyA: A => Long, tsA: A => Long, idA: A => Long,
      keyB: B => Long, tsB: B => Long, idB: B => Long,
      zero: S,
      on1: (Long, S, A) => (S, Seq[O]),
      on2: (Long, S, B) => (S, Seq[O]),
      watermarkDelay: String = "0 seconds")(
      implicit aEnc: Encoder[A], bEnc: Encoder[B], oEnc: Encoder[O]): Stream[O] =
    new Stream(graft.streaming.ConnectedOps.keyedCoProcessOrdered(
      a, keyA, tsA, idA, b, keyB, tsB, idB, zero, on1, on2, watermarkDelay))
}

object Stream {
  /** Keyed entry (reference `DataStream.keyBy`): field-name keying
   * over any case-class stream, matching the schema-generic state
   * layer (`StatefulOps.scala:50`). */
  implicit final class KeyedOps[T <: Product : TypeTag](private val s: Stream[T]) {
    def keyBy(field: String): KeyedStream[T] = new KeyedStream[T](s.ds, field)
  }
}

/** Reference `KeyedStream<T, K>`: keyed stateful operators, all routed
 * to the schema-generic state ops. */
final class KeyedStream[T <: Product : TypeTag](val ds: Dataset[T], val keyField: String) {

  /** Keep-last dedup per key (reference
   * ProcTimeDeduplicateKeepLastRowFunction): update stream of the
   * per-key winner by (time, id). */
  def keepLast(timeField: String, idField: String,
      ttl: Option[String] = None): Stream[T] =
    new Stream(StatefulOps.keepLastBy(ds, keyField, timeField, idField, ttl))

  /** Streaming Top-N per key (reference AppendOnlyTopNFunction):
   * update stream of the per-key N best by (value desc, id asc). */
  def topN(valueField: String, idField: String, n: Int,
      ttl: Option[String] = None): Stream[T] =
    new Stream(StatefulOps.topNBy(ds, keyField, valueField, idField, n, ttl))

  /** CEP over this keyed stream (reference `CEP.pattern(keyedStream,
   * pattern)` returning a `PatternStream`): full step→event bindings
   * per match, with the reference's side channels — timed-out partial
   * matches (`flatSelect(timeoutTag, …)` /
   * `TimedOutPartialMatchHandler`) and late data
   * (`sideOutputLateData`) — exposed as filtered views of the one
   * operator output (Spark has no side-output edges; the channel tag
   * is the pseudo-step marker). */
  def cep(pattern: Cep.Pattern[T], timeField: String, idField: String,
      watermarkDelay: String = "1 hour",
      timedOut: Boolean = false, lateCapture: Boolean = false): PatternStream[T] =
    new PatternStream(Cep.runBoundBy(ds, pattern, keyField, timeField, idField,
      watermarkDelay, timedOut = timedOut, lateCapture = lateCapture))
}

/** Reference `PatternStream` (`cep/PatternStream.java`): the matched
 * stream plus its tagged side channels. */
final class PatternStream[T](val all: Dataset[CepBoundG[T]]) {
  /** Completed matches (reference `select`/`flatSelect` main output). */
  def select: Dataset[CepBoundG[T]] =
    all.filter((b: CepBoundG[T]) => !b.binds.head.step.startsWith("__"))
  /** Timed-out partial matches — binds carry the original step names
   * behind the `__timedout:` prefix (reference
   * `TimedOutPartialMatchHandler`). Requires `timedOut = true`. */
  def timedOutPartials: Dataset[CepBoundG[T]] =
    all.filter((b: CepBoundG[T]) => b.binds.head.step.startsWith(Cep.TimedOutStep))
  /** Too-late input events, one pseudo-bind each (reference
   * `sideOutputLateData`). Requires `lateCapture = true`. */
  def lateData: Dataset[CepBoundG[T]] =
    all.filter((b: CepBoundG[T]) => b.binds.head.step == Cep.LateStep)
}

/** Reference `StreamTableEnvironment`: DDL + SQL, including the
 * extended surfaces Spark's parser lacks. */
final class TableEnv(val spark: SparkSession) {

  private val DdlShaped =
    """(?is)\s*(CREATE\s+(TABLE|(OR\s+REPLACE\s+)?(TEMPORARY\s+)?VIEW|(TEMPORARY\s+)?(SYSTEM\s+)?FUNCTION)|DROP\s+(TABLE|(TEMPORARY\s+)?VIEW)|INSERT\s+(INTO|OVERWRITE)|EXECUTE\s+STATEMENT\s+SET|SHOW\s+(TABLES|VIEWS|CREATE\s+TABLE|(USER\s+)?FUNCTIONS|PARTITIONS)|DESC(RIBE)?\s|EXPLAIN\s|ALTER\s+TABLE|SET\s+'|RESET\s+')\b.*""".r

  /** The reference's single SQL door (`TableEnvironment.executeSql`):
   * DDL, INSERT, and statement sets route to the connector-DDL layer;
   * anything else is a query and routes through [[sqlQuery]]'s
   * desugar chain. */
  def executeSql(sql: String): DataFrame = sql match {
    case DdlShaped(_*) => graft.sqlx.Ddl.execute(spark, sql)
    case _ => sqlQuery(sql)
  }

  /** Reference `StreamTableEnvironment.fromChangelogStream` (FLIP-136):
   * interpret a frame carrying a `row_kind` column (+I/-U/+U/-D),
   * keyed by `keys` and ordered by `seqCol`, as an updating table —
   * materialized to the latest image per surviving key (deleted keys
   * absent), the same normalize every upsert sink performs. */
  def fromChangelogStream(changelog: DataFrame, keys: Seq[String],
      seqCol: String): DataFrame =
    graft.changelog.ChangelogOps.normalize(changelog, keys, seqCol)

  /** Reference `StreamTableEnvironment.toChangelogStream`: a keyed
   * table's version history re-expressed as the retract changelog —
   * +I for a key's first version, then a -U/+U pair per later
   * version. */
  def toChangelogStream(history: DataFrame, keys: Seq[String],
      versionCol: String): DataFrame =
    graft.changelog.ChangelogOps.toChangelog(history, keys, versionCol)

  /** SQL query with the extended surfaces Spark's parser lacks:
   * MATCH_RECOGNIZE clauses splice out first (each becomes a temp view
   * over the CEP engine's output), then window TVFs
   * (`TUMBLE/HOP/CUMULATE(TABLE …, DESCRIPTOR(…))`) desugar, then
   * `FOR SYSTEM_TIME AS OF` routes through the temporal join
   * desugar+rule; everything else straight to Catalyst. The three
   * compose because every rewrite is text-to-text. */
  def sqlQuery(query0: String): DataFrame = {
    val query1 =
      if (graft.sqlx.SqlLexer.findKeyword(query0, "MATCH_RECOGNIZE").isDefined)
        graft.sqlx.MatchRecognizeSql.desugar(spark, query0)
      else query0
    // legacy group windows (GROUP BY TUMBLE/HOP/SESSION(ts, INTERVAL …)
    // + *_START/*_END): no-op when absent; TVF-form calls are skipped
    // and handled below
    // [NOT] SIMILAR TO → regexp_like with a translated pattern
    val query2 = graft.sqlx.SimilarToSql.desugar(query1)
    // LATERAL TABLE (temporalFn(ts)) → FOR SYSTEM_TIME AS OF join form
    val query3 =
      if ("""(?i)\bLATERAL\s+TABLE\b""".r.findFirstIn(query2).isDefined)
        graft.sqlx.TemporalFnSql.desugar(query2)
      else query2
    val query = graft.sqlx.GroupWindowSql.desugar(query3)
    val tvf = """(?i)\bDESCRIPTOR\s*\(""".r.findFirstIn(query).isDefined
    val temporal = """(?i)FOR\s+SYSTEM_TIME\s+AS\s+OF""".r.findFirstIn(query).isDefined
    (tvf, temporal) match {
      case (true, false) => graft.sqlx.WindowTvfSql.sql(spark, query)
      case (true, true) =>
        graft.sqlx.TemporalSql.sql(spark, graft.sqlx.WindowTvfSql.desugar(query))
      case (false, true) => graft.sqlx.TemporalSql.sql(spark, query)
      case (false, false) => spark.sql(query)
    }
  }

  /** MATCH_RECOGNIZE over any input frame (reference
   * `StreamExecMatch`). */
  def matchRecognize(input: DataFrame, sql: String,
      idCol: String = "event_id"): DataFrame =
    graft.sqlx.MatchRecognize.run(input, sql, idCol)

  def createTemporaryView(name: String, df: DataFrame): Unit =
    df.createOrReplaceTempView(name)

  /** Reference `TableEnvironment.from("name")`: entry into the fluent
   * [[Table]] API over a registered table/view. */
  def from(name: String): Table = new Table(spark.table(name))

  def fromDataFrame(df: DataFrame): Table = new Table(df)
}
