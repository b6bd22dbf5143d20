package graft.queries

import graft.{QueryPack, Tables}
import graft.api._
import graft.operators.{AsyncLookup, LookupJoin}
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import scala.concurrent.Future

/** Example user functions, named/shaped like the reference's docs. */
object ExampleFns {

  class PriceBand extends ScalarFunction1[Double, String] {
    override def eval(p: Double): String =
      if (p > 200000) "high" else if (p > 100000) "mid" else "low"
  }

  /** Emits (word, 0-based idx, length) rows per document. */
  /** FLIP-29 map demo: the struct output REPLACES the input row, so
   * the function carries the id through itself. Token count matches
   * the oracle's `len(string_split(trim(text), ' '))`; char count is
   * code points (DuckDB `length` semantics), not UTF-16 units. */
  class DocShape extends ScalarFunction2[Long, String, (Long, Long, Long)] {
    override def eval(id: Long, text: String): (Long, Long, Long) = {
      val t = text.trim
      (id, t.split(" ").length.toLong, text.codePointCount(0, text.length).toLong)
    }
  }

  class WordsWithIdx extends TableFunction1[String, (String, Int, Int)] {
    override def eval(text: String): Unit =
      text.split(" ").zipWithIndex.foreach { case (w, i) => collect((w, i, w.length)) }
  }

  /** Weighted average in integer cents: floor-quantized, exact. */
  class WeightedAvg extends AggregateFunction[(Double, Double), (Long, Long), Long] {
    override def createAccumulator(): (Long, Long) = (0L, 0L)
    override def accumulate(acc: (Long, Long), in: (Double, Double)): (Long, Long) = {
      val w = math.floor(in._1).toLong
      (acc._1 + math.floor(in._2 * 100).toLong * w, acc._2 + w)
    }
    override def mergeAcc(a: (Long, Long), b: (Long, Long)): (Long, Long) =
      (a._1 + b._1, a._2 + b._2)
    override def getValue(acc: (Long, Long)): Long =
      if (acc._2 == 0) 0L else acc._1 / acc._2
    override def bufferEncoder: Encoder[(Long, Long)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** The reference docs' Top2 table aggregate: two largest values with
   * ranks (reference `TableAggregateFunction` Top2 example shape). */
  class Top2 extends TableAggregateFunction[Long, (Long, Long), (Long, Int)] {
    private val None_ = Long.MinValue
    override def createAccumulator(): (Long, Long) = (None_, None_)
    override def accumulate(acc: (Long, Long), in: Long): (Long, Long) =
      if (in > acc._1) (in, acc._1)
      else if (in > acc._2) (acc._1, in)
      else acc
    // sentinel values merge harmlessly (never greater than a real value)
    override def mergeAcc(a: (Long, Long), b: (Long, Long)): (Long, Long) =
      accumulate(accumulate(a, b._1), b._2)
    override def emitValue(acc: (Long, Long)): Seq[(Long, Int)] =
      Seq(acc._1 -> 1, acc._2 -> 2).filter(_._1 != None_)
    override def bufferEncoder: Encoder[(Long, Long)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    override def outputEncoder: Encoder[Seq[(Long, Int)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Int)]]()
  }
}

/**
 * UDF surface (SURVEY §2.10 — reference
 * `flink-table-common/.../functions/{Scalar,Table,Aggregate,
 * TableAggregate,AsyncTable}Function.java`) + lookup join
 * (`StreamExecLookupJoin.java:43`), exercised through the gate.
 *
 * Scale notes: scalar/table UDFs run inside the scan's stage (JVM
 * lambda, no Python bridge); the typed aggregates are real two-phase
 * `Aggregator`s (partial merge on the map side); lookup joins open one
 * connection per PARTITION and keep async lookups bounded+ordered.
 */
object UdfQueries extends QueryPack {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Fluent Table API (reference Table.java string-expression form):
    // from → filter → join → select → groupBy().select() → orderBy —
    // every step a veneer over the DataFrame API, so the plan is what
    // Catalyst would build from the SQL twin the oracle runs.
    "table_api_pipeline" -> ((s, dir) => {
      val te = new TableEnv(s)
      Tables.load(s, dir, "orders").createOrReplaceTempView("orders_tapi")
      Tables.load(s, dir, "customer").createOrReplaceTempView("cust_tapi")
      te.from("orders_tapi")
        .filter("o_orderpriority = '1-URGENT'")
        .join(te.from("cust_tapi").select("c_custkey, c_mktsegment"),
          "o_custkey = c_custkey")
        .select("c_mktsegment, floor(o_totalprice * 100) AS cents")
        .groupBy("c_mktsegment")
        .select("c_mktsegment, count(1) AS n, sum(cents) AS sum_cents")
        .orderBy("c_mktsegment.asc")
        .toDataFrame
    }),

    // Fluent group-window Table API (reference Tumble.java:33 —
    // `table.window(Tumble.over("15.minutes").on("ts").as("w"))
    // .groupBy("w, event_type").select("…, w.start, w.end, agg…")`).
    "table_api_group_window" -> ((s, dir) => {
      val te = new TableEnv(s)
      Tables.load(s, dir, "events").createOrReplaceTempView("events_tapi")
      te.from("events_tapi")
        .window(graft.api.Tumble.over("15.minutes").on("ts").as("w"))
        .groupBy("w, event_type")
        .select("w.start AS ws, w.end AS we, event_type, " +
          "count(1) AS n, sum(floor(value * 100)) AS cents")
        .orderBy("ws.asc, event_type.asc")
        .toDataFrame
    }),

    // Fluent OVER-window Table API (reference Over.java:44): running
    // RANGE frame per user, the `agg OVER w` select suffix.
    "table_api_over_window" -> ((s, dir) => {
      val te = new TableEnv(s)
      Tables.load(s, dir, "events").createOrReplaceTempView("events_tapi2")
      te.from("events_tapi2")
        .window(graft.api.Over.partitionBy("user_id").orderBy("ts")
          .preceding("UNBOUNDED_RANGE").as("w"))
        .select("user_id, event_id, " +
          "sum(floor(value * 100)) OVER w AS running_cents")
        .orderBy("user_id.asc, event_id.asc")
        .toDataFrame
    }),

    // FLIP-29 row-based map: the registered scalar call's struct
    // output replaces the row, renamed positionally via AS (…).
    "table_api_map_fn" -> ((s, dir) => {
      Udfs.register2(s, "doc_shape", new ExampleFns.DocShape)
      val docs = Tables.load(s, dir, "documents").filter(col("doc_id") <= 100)
        .select(col("doc_id"), col("text"))
      new TableEnv(s).fromDataFrame(docs)
        .map("doc_shape(doc_id, text) AS (doc_id, n_tokens, n_chars)")
        .orderBy("doc_id")
        .toDataFrame
    }),

    // FLIP-29 joinLateral + flatAggregate chain: correlate each doc
    // with its words (table function), filter, then a table-aggregate
    // (Top2) emits up to two rows per group, exploded by the facade.
    "table_api_row_ops" -> ((s, dir) => {
      Udfs.registerTable(s, "words_with_idx", new ExampleFns.WordsWithIdx)
      s.udf.register("top2", udaf(new ExampleFns.Top2))
      val docs = Tables.load(s, dir, "documents").filter(col("doc_id") <= 30)
        .select(col("doc_id"), col("text"))
      new TableEnv(s).fromDataFrame(docs)
        .joinLateral("words_with_idx(trim(text)) AS (word, idx, wlen)")
        .filter("wlen >= 3")
        .groupBy("doc_id")
        .flatAggregate("top2(CAST(wlen AS BIGINT)) AS (top_wlen, rank)")
        .select("doc_id, top_wlen, rank")
        .orderBy("doc_id, rank")
        .toDataFrame
    }),

    // FLIP-29 aggregate(): the AggregateFunction call through the
    // fluent groupBy().aggregate().select() chain.
    "table_api_agg_fn" -> ((s, dir) => {
      s.udf.register("weighted_avg", udaf(new ExampleFns.WeightedAvg))
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
      new TableEnv(s).fromDataFrame(li)
        .groupBy("l_returnflag")
        .aggregate("weighted_avg(l_quantity, l_extendedprice) AS wavg_cents")
        .select("l_returnflag, wavg_cents")
        .orderBy("l_returnflag")
        .toDataFrame
    }),

    // ScalarFunction through SQL.
    "udf_scalar_fn" -> ((s, dir) => {
      Udfs.register(s, "price_band", new ExampleFns.PriceBand)
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT o_orderkey, price_band(o_totalprice) AS band
        FROM orders WHERE o_orderkey <= 1000 ORDER BY o_orderkey""")
    }),

    // TableFunction: 0..n collected rows per input row, exploded.
    "udf_table_fn" -> ((s, dir) => {
      Udfs.registerTable(s, "words_with_idx", new ExampleFns.WordsWithIdx)
      Tables.load(s, dir, "documents")
        .filter(col("doc_id") <= 50)
        .select(col("doc_id"), explode(expr("words_with_idx(trim(text))")).as("p"))
        .select(col("doc_id"), col("p._1").as("word"), col("p._3").cast("bigint").as("wlen"))
        .orderBy(col("doc_id"), col("word"), col("wlen"))
    }),

    // AggregateFunction as a registered UDAF (two-phase partial agg).
    "udf_agg_weighted_avg" -> ((s, dir) => {
      s.udf.register("weighted_avg", udaf(new ExampleFns.WeightedAvg))
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT l_returnflag, weighted_avg(l_quantity, l_extendedprice) AS wavg_cents
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
    }),

    // TableAggregateFunction: Top2 rows per group, exploded after agg.
    "udf_table_agg_top2" -> ((s, dir) => {
      import s.implicits._
      val top2 = new ExampleFns.Top2
      Tables.load(s, dir, "lineitem")
        .select(col("l_returnflag").as("flag"),
          floor(col("l_extendedprice") * 100).as("cents"))
        .as[(String, Long)]
        .groupByKey(_._1).mapValues(_._2)
        .agg(top2.toColumn.name("top2"))
        .toDF("flag", "top2")
        .select(col("flag"), explode(col("top2")).as("p"))
        .select(col("flag"), col("p._1").as("cents"), col("p._2").as("rank"))
        .orderBy(col("flag"), col("rank"))
    }),

    // Sync lookup join: each partition opens its own KV client (bare
    // parquet-mr read of the dim — no driver collect; swap for the
    // JDBC/HBase connector the reference probes).
    "lookup_join_sync" -> ((s, dir) => {
      import s.implicits._
      val table = new graft.operators.ParquetKvTable(
        s"$dir/nation.parquet", "n_nationkey", "n_name")
      val cust = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey")).as[(Long, Long)]
      LookupJoin(cust, table)(_._2) { case ((ck, _), name) => (ck, name.getOrElse("?")) }
        .toDF("c_custkey", "n_name")
        .orderBy(col("c_custkey"))
    }),

    // JDBC lookup join (reference JdbcRowDataLookupFunction): the dim
    // is loaded into embedded Derby, then each partition's client does
    // point SELECTs over a prepared statement — a real external-store
    // probe, not a broadcast.
    "lookup_join_jdbc" -> ((s, dir) => {
      import s.implicits._
      val db = java.nio.file.Files.createTempDirectory("graft_jlkp").toString + "/db"
      val url = s"jdbc:derby:$db;create=true"
      Tables.load(s, dir, "nation").select("n_nationkey", "n_name")
        .write.format("jdbc")
        .option("url", url).option("dbtable", "NATION_LKP")
        .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
        .option("createTableColumnTypes", "n_nationkey BIGINT, n_name VARCHAR(64)")
        .mode("overwrite").save()
      val table = new graft.operators.JdbcKvTable(url,
        "org.apache.derby.jdbc.EmbeddedDriver", "NATION_LKP", "n_nationkey", "n_name")
      val cust = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey")).as[(Long, Long)]
      LookupJoin(cust, table)(_._2) { case ((ck, _), name) => (ck, name.getOrElse("?")) }
        .toDF("c_custkey", "n_name")
        .orderBy(col("c_custkey"))
    }),

    // Cached JDBC lookup join (reference lookup.cache.max-rows +
    // lookup.cache.ttl): the per-partition point-read client sits
    // behind a bounded LRU with TTL, so hot keys stop hitting the
    // store — results identical to the uncached probe.
    "lookup_join_cached" -> ((s, dir) => {
      import s.implicits._
      val db = java.nio.file.Files.createTempDirectory("graft_jlkc").toString + "/db"
      val url = s"jdbc:derby:$db;create=true"
      Tables.load(s, dir, "nation").select("n_nationkey", "n_name")
        .write.format("jdbc")
        .option("url", url).option("dbtable", "NATION_LKP")
        .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
        .option("createTableColumnTypes", "n_nationkey BIGINT, n_name VARCHAR(64)")
        .mode("overwrite").save()
      val table = new graft.operators.CachedLookupTable(
        new graft.operators.JdbcKvTable(url,
          "org.apache.derby.jdbc.EmbeddedDriver", "NATION_LKP", "n_nationkey", "n_name"),
        maxRows = 16, ttlMs = 600000L)
      val cust = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey")).as[(Long, Long)]
      LookupJoin(cust, table)(_._2) { case ((ck, _), name) => (ck, name.getOrElse("?")) }
        .toDF("c_custkey", "n_name")
        .orderBy(col("c_custkey"))
    }),

    // Async lookup join (ordered, bounded in-flight futures) probing
    // the same per-task KV client.
    "lookup_join_async" -> ((s, dir) => {
      import s.implicits._
      import scala.concurrent.ExecutionContext.Implicits.global
      val table = new graft.operators.ParquetKvTable(
        s"$dir/nation.parquet", "n_nationkey", "n_name")
      val cust = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey")).as[(Long, Long)]
      AsyncLookup.mapAsyncOrdered(cust, parallelism = 8) { case (ck, nk) =>
        Future((ck, table.lookup(nk).getOrElse("?")))
      }.toDF("c_custkey", "n_name")
        .orderBy(col("c_custkey"))
    })
  )

  override def oracle: Map[String, String] = Map(
    "table_api_pipeline" -> """
      SELECT c_mktsegment, count(1) AS n,
             CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE o_orderpriority = '1-URGENT'
      GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "table_api_group_window" -> """
      SELECT time_bucket(INTERVAL 15 MINUTE, ts) AS ws,
             time_bucket(INTERVAL 15 MINUTE, ts) + INTERVAL 15 MINUTE AS we,
             event_type, count(1) AS n,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events
      GROUP BY ws, event_type ORDER BY ws, event_type""",
    "table_api_over_window" -> """
      SELECT user_id, event_id,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)) OVER (
               PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS running_cents
      FROM events ORDER BY user_id, event_id""",
    "table_api_map_fn" -> """
      SELECT doc_id, CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens,
             CAST(length(text) AS BIGINT) AS n_chars
      FROM documents WHERE doc_id <= 100 ORDER BY doc_id""",
    "table_api_row_ops" -> """
      WITH w AS (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS word
                 FROM documents WHERE doc_id <= 30),
      f AS (SELECT doc_id, CAST(length(word) AS BIGINT) AS wlen
            FROM w WHERE length(word) >= 3),
      r AS (SELECT doc_id, wlen,
                   row_number() OVER (PARTITION BY doc_id ORDER BY wlen DESC) AS rank
            FROM f)
      SELECT doc_id, wlen AS top_wlen, CAST(rank AS INT) AS rank
      FROM r WHERE rank <= 2 ORDER BY doc_id, rank""",
    "table_api_agg_fn" -> """
      SELECT l_returnflag,
             CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)
                      * CAST(floor(l_quantity) AS BIGINT))
                  // sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS wavg_cents
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "udf_scalar_fn" -> """
      SELECT o_orderkey,
             CASE WHEN o_totalprice > 200000 THEN 'high'
                  WHEN o_totalprice > 100000 THEN 'mid'
                  ELSE 'low' END AS band
      FROM orders WHERE o_orderkey <= 1000 ORDER BY o_orderkey""",
    "udf_table_fn" -> """
      SELECT doc_id, word, CAST(length(word) AS BIGINT) AS wlen
      FROM (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS word
            FROM documents WHERE doc_id <= 50) t
      ORDER BY doc_id, word, wlen""",
    "udf_agg_weighted_avg" -> """
      SELECT l_returnflag,
             CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)
                      * CAST(floor(l_quantity) AS BIGINT))
                  // sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS wavg_cents
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "udf_table_agg_top2" -> """
      SELECT l_returnflag AS flag, cents, CAST(rn AS INT) AS rank
      FROM (SELECT l_returnflag, CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents,
                   row_number() OVER (PARTITION BY l_returnflag
                     ORDER BY CAST(floor(l_extendedprice * 100) AS BIGINT) DESC) AS rn
            FROM lineitem) t
      WHERE rn <= 2 ORDER BY flag, rank""",
    "lookup_join_sync" -> """
      SELECT c_custkey, n_name
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      ORDER BY c_custkey""",
    "lookup_join_jdbc" -> """
      SELECT c_custkey, n_name
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      ORDER BY c_custkey""",
    "lookup_join_async" -> """
      SELECT c_custkey, n_name
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      ORDER BY c_custkey""",
    "lookup_join_cached" -> """
      SELECT c_custkey, n_name
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      ORDER BY c_custkey"""
  )
}
