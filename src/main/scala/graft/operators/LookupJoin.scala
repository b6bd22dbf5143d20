package graft.operators

import org.apache.spark.sql.{Dataset, Encoder}
import scala.concurrent.{Await, Future}
import scala.concurrent.duration._

/**
 * Lookup join against an external system (reference
 * `exec/stream/StreamExecLookupJoin.java:43`, runtime
 * `join/lookup/LookupJoinRunner.java` / `AsyncLookupJoinRunner`):
 * probe a per-partition connection for each row instead of shuffling a
 * dimension table.
 *
 * Scale notes: `mapPartitions` opens ONE connection per partition (not
 * per row) and streams rows through it — at 1000 executors this is the
 * standard connection-pooled enrichment pattern; when the dimension
 * fits in memory, prefer a broadcast join instead (Catalyst handles
 * that path natively — see `join_broadcast_dim`).
 */
object LookupJoin {

  /** The external-system handle; `open` runs once per partition. */
  trait LookupTable[K, V] extends Serializable {
    def open(): Unit = ()
    def lookup(k: K): Option[V]
    def close(): Unit = ()
  }

  /** Synchronous lookup join: left outer semantics via Option. */
  def apply[I, K, V, O: Encoder](ds: Dataset[I], table: LookupTable[K, V])(
      key: I => K)(combine: (I, Option[V]) => O): Dataset[O] =
    ds.mapPartitions { it =>
      table.open()
      new Iterator[O] {
        def hasNext: Boolean = { val h = it.hasNext; if (!h) table.close(); h }
        def next(): O = { val i = it.next(); combine(i, table.lookup(key(i))) }
      }
    }
}

/**
 * A KV "client" backed by a parquet file, loaded lazily PER PARTITION
 * with the bare parquet-mr reader — no SparkSession, no driver
 * materialization: exactly the shape of a real dimension-store client
 * (the reference's JDBC/HBase `LookupFunction`s — swap `open()` for a
 * connection pool and `lookup` for a point read). The keyed map lives
 * on the executor that opened it; at 1000 executors each loads its own
 * copy, like any connection-local cache.
 */
class ParquetKvTable(path: String, keyCol: String, valCol: String)
    extends LookupJoin.LookupTable[Long, String] {
  @transient private var m: java.util.HashMap[java.lang.Long, String] = _

  override def open(): Unit = synchronized {
    if (m != null) return
    m = new java.util.HashMap[java.lang.Long, String]()
    val reader = org.apache.parquet.hadoop.ParquetReader
      .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(),
        new org.apache.hadoop.fs.Path(path))
      .build()
    var g = reader.read()
    while (g != null) {
      // the key may be INT32 or INT64 in the store's schema
      val keyIsInt32 = g.getType.getType(keyCol).asPrimitiveType()
        .getPrimitiveTypeName == org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT32
      val k: java.lang.Long = if (keyIsInt32) g.getInteger(keyCol, 0).toLong else g.getLong(keyCol, 0)
      m.put(k, g.getString(valCol, 0))
      g = reader.read()
    }
    reader.close()
  }

  override def lookup(k: Long): Option[String] = {
    open() // idempotent: first probe on this task loads the store
    Option(m.get(k))
  }
}

/**
 * JDBC point-read lookup client (reference
 * `flink-connector-jdbc/.../table/JdbcRowDataLookupFunction`): one
 * connection + prepared statement per task, a point SELECT per probe
 * key — the real external-dimension shape (a production client adds a
 * bounded LRU cache in front, the reference's `lookup.cache.*`
 * options). */
class JdbcKvTable(url: String, driver: String, table: String,
    keyCol: String, valCol: String)
    extends LookupJoin.LookupTable[Long, String] {
  @transient private var conn: java.sql.Connection = _
  @transient private var stmt: java.sql.PreparedStatement = _

  override def open(): Unit = synchronized {
    if (conn != null) return
    Class.forName(driver)
    conn = java.sql.DriverManager.getConnection(url)
    // identifiers are quoted because Spark's JDBC writer creates them
    // quoted (case-sensitive) — unquoted names would upcase in Derby
    stmt = conn.prepareStatement(
      s"""SELECT "$valCol" FROM $table WHERE "$keyCol" = ?""")
  }

  override def lookup(k: Long): Option[String] = {
    open() // idempotent: first probe on this task connects
    stmt.setLong(1, k)
    val rs = stmt.executeQuery()
    try { if (rs.next()) Option(rs.getString(1)) else None }
    finally rs.close()
  }

  override def close(): Unit = synchronized {
    if (stmt != null) { stmt.close(); stmt = null }
    if (conn != null) { conn.close(); conn = null }
  }
}

/**
 * Async I/O enrichment (reference `AsyncDataStream` /
 * `api/operators/async/AsyncWaitOperator.java:78`, ordered mode):
 * bounded in-flight futures per partition, results emitted in input
 * order.
 */
object AsyncLookup {

  /** `parallelism` futures in flight per partition; blocks on the
   * oldest future only when the window is full or input is drained —
   * the reference's ordered AsyncWaitOperator queue.
   *
   * Timeout semantics mirror `AsyncFunction#timeout`: by default an
   * expired future FAILS THE JOB (the reference's default throws);
   * pass `onTimeout` to emit a per-input fallback instead (the
   * reference's overridable timeout callback completing the result
   * future). */
  def mapAsyncOrdered[I, O: Encoder](ds: Dataset[I], parallelism: Int,
      timeout: Duration = 5.minutes, onTimeout: Option[I => O] = None)(
      f: I => Future[O]): Dataset[O] = {
    require(parallelism >= 1)
    ds.mapPartitions { it =>
      val inFlight = scala.collection.mutable.Queue.empty[(I, Future[O])]
      new Iterator[O] {
        private def fill(): Unit =
          while (inFlight.size < parallelism && it.hasNext) {
            val i = it.next(); inFlight.enqueue((i, f(i)))
          }
        def hasNext: Boolean = { fill(); inFlight.nonEmpty }
        def next(): O = {
          fill()
          val (i, fut) = inFlight.dequeue()
          try Await.result(fut, timeout)
          catch { case e: java.util.concurrent.TimeoutException =>
            onTimeout.map(_(i)).getOrElse(throw e)
          }
        }
      }
    }
  }

  /** UNORDERED mode (reference `AsyncDataStream.unorderedWait`):
   * results emit in COMPLETION order per partition — lower latency
   * when per-element service times vary, at the cost of input order.
   * A timed-out window fails the job (no per-input fallback: the
   * completion-order queue does not retain input attribution, and the
   * reference's unordered timeout likewise fails by default). */
  def mapAsyncUnordered[I, O: Encoder](ds: Dataset[I], parallelism: Int,
      timeout: Duration = 5.minutes)(f: I => Future[O]): Dataset[O] = {
    require(parallelism >= 1)
    ds.mapPartitions { it =>
      // resolved on the EXECUTOR — an ExecutionContext must not ride
      // the task closure (it is not serializable)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.global
      val inFlight = scala.collection.mutable.ListBuffer.empty[Future[O]]
      new Iterator[O] {
        private def fill(): Unit =
          while (inFlight.size < parallelism && it.hasNext) inFlight += f(it.next())
        def hasNext: Boolean = { fill(); inFlight.nonEmpty }
        def next(): O = {
          fill()
          Await.ready(Future.firstCompletedOf(inFlight.toList), timeout)
          val done = inFlight.find(_.isCompleted).get
          inFlight -= done
          done.value.get.get
        }
      }
    }
  }
}

/**
 * Bounded lookup cache (reference `lookup.cache.max-rows` +
 * `lookup.cache.ttl`, `flink-connector-jdbc/.../JdbcConnectorOptions.java`
 * → the Guava cache in `JdbcRowDataLookupFunction`): wraps any
 * LookupTable with an access-order LRU of at most `maxRows` entries,
 * each expiring `ttlMs` after write. MISSES are cached too — the
 * reference caches empty results, shielding the dimension store from
 * hot missing keys.
 *
 * Scale: the cache is per serialized copy (per partition/task), which
 * is exactly the reference's per-subtask cache scope — at 1000
 * executors, 1000 independent caches, each bounded by `maxRows`.
 * `clock` is injectable so TTL behavior is deterministically testable.
 */
class CachedLookupTable[K, V](inner: LookupJoin.LookupTable[K, V],
    maxRows: Int, ttlMs: Long,
    clock: () => Long = () => System.currentTimeMillis())
  extends LookupJoin.LookupTable[K, V] {

  require(maxRows > 0 && ttlMs > 0, "maxRows and ttlMs must be positive")

  @transient private var cache: java.util.LinkedHashMap[K, (Long, Option[V])] = _
  @transient private var innerCalls0 = 0L

  /** Lookups that reached the wrapped table (spec instrumentation). */
  def innerCalls: Long = innerCalls0

  override def open(): Unit = {
    inner.open()
    cache = new java.util.LinkedHashMap[K, (Long, Option[V])](16, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[K, (Long, Option[V])]): Boolean =
        size() > maxRows
    }
  }

  override def lookup(k: K): Option[V] = {
    if (cache == null) open() // wrapped opens are idempotent
    val now = clock()
    val hit = cache.get(k)
    if (hit != null && now - hit._1 < ttlMs) hit._2
    else {
      innerCalls0 += 1
      val v = inner.lookup(k)
      cache.put(k, (now, v))
      v
    }
  }

  override def close(): Unit = { cache = null; inner.close() }
}
