package graft.queries

import graft.QueryPack
import graft.sqlx.Ddl
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Connector-DDL surface (reference `parserImpls.ftl:569,849`): tables
 * declared with `CREATE TABLE … WITH (…)` incl. computed columns, then
 * queried through plain `spark.sql` — the reference's SQL entry path.
 */
object DdlQueries extends QueryPack {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Parquet connector + computed column through DDL, queried via SQL.
    "ddl_sql_pipeline" -> ((s, dir) => {
      Ddl.execute(s,
        s"""CREATE TABLE lineitem_t (
              l_orderkey BIGINT,
              l_returnflag STRING,
              l_quantity DOUBLE,
              l_extendedprice DOUBLE,
              l_discount DOUBLE,
              net AS floor(l_extendedprice * (1.0d - l_discount) * 100)
            ) WITH (
              'connector' = 'filesystem',
              'path' = '$dir/lineitem.parquet',
              'format' = 'parquet'
            )""")
      s.sql("""
        SELECT l_returnflag, count(*) AS n,
               sum(net) AS net_cents,
               sum(floor(l_quantity * 100)) AS qty_cents
        FROM lineitem_t
        GROUP BY l_returnflag ORDER BY l_returnflag""")
    }),

    // CREATE VIEW over a DDL table (reference SqlCreateView): the view
    // layers a filter+projection; the final query composes on top.
    "ddl_create_view" -> ((s, dir) => {
      Ddl.execute(s,
        s"""CREATE TABLE orders_t (
              o_orderkey BIGINT,
              o_custkey BIGINT,
              o_orderpriority STRING,
              o_totalprice DOUBLE
            ) WITH (
              'connector' = 'filesystem',
              'path' = '$dir/orders.parquet',
              'format' = 'parquet'
            )""")
      Ddl.execute(s,
        """CREATE OR REPLACE VIEW urgent_orders AS
           SELECT o_custkey, floor(o_totalprice * 100) AS price_cents
           FROM orders_t WHERE o_orderpriority = '1-URGENT'""")
      s.sql("""
        SELECT o_custkey, count(*) AS n, sum(price_cents) AS spend_cents
        FROM urgent_orders GROUP BY o_custkey ORDER BY o_custkey""")
    }),

    // CHAR(n) padding semantics at the DDL layer (SURVEY §7.5;
    // reference planner CHAR handling): a CHAR(12) declaration pads
    // short values with spaces, a CHAR(6) declaration truncates long
    // ones — both normalized on read so every downstream expression
    // sees fixed-width values.
    "ddl_char_padding" -> ((s, dir) => {
      Ddl.execute(s,
        s"""CREATE TABLE nation_pad (
              n_nationkey INT,
              n_name CHAR(12)
            ) WITH (
              'connector' = 'filesystem',
              'path' = '$dir/nation.parquet',
              'format' = 'parquet'
            )""")
      Ddl.execute(s,
        s"""CREATE TABLE nation_cut (
              n_nationkey INT,
              n_name CHAR(6)
            ) WITH (
              'connector' = 'filesystem',
              'path' = '$dir/nation.parquet',
              'format' = 'parquet'
            )""")
      s.sql("""
        SELECT p.n_nationkey, p.n_name AS name_pad,
               length(p.n_name) AS len_pad,
               c.n_name AS name_cut, length(c.n_name) AS len_cut
        FROM nation_pad p JOIN nation_cut c ON p.n_nationkey = c.n_nationkey
        ORDER BY p.n_nationkey""")
    }),

    // CSV connector through DDL: write a CSV staging copy, declare it
    // with a schema (reference CSV formats never infer — §1.3), query.
    // EXECUTE STATEMENT SET (reference SqlStatementSet /
    // TableEnvironment.createStatementSet): one source declared via
    // DDL fans out into two declared parquet sinks in a single
    // statement; the refreshed sink views are then queried back. The
    // gate output is the union of both sink aggregates, so both
    // INSERTs are oracle-checked.
    // JDBC connector through DDL (reference flink-connector-jdbc
    // JdbcDynamicTableFactory: 'connector'='jdbc', 'url',
    // 'table-name'): declare source + jdbc sink, INSERT INTO runs the
    // write, the read-back is a partitioned jdbc scan.
    "ddl_jdbc_connector" -> ((s, dir) => {
      val db = java.nio.file.Files.createTempDirectory("graft_jdbcddl").toString + "/db"
      Ddl.execute(s,
        s"""CREATE TABLE jsrc_nation (
              n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT
            ) WITH ('connector' = 'filesystem',
                    'path' = '$dir/nation.parquet', 'format' = 'parquet')""")
      Ddl.execute(s,
        s"""CREATE TABLE jdb_nation (
              n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT
            ) WITH ('connector' = 'jdbc',
                    'url' = 'jdbc:derby:$db;create=true',
                    'table-name' = 'NATION_DDL',
                    'driver' = 'org.apache.derby.jdbc.EmbeddedDriver',
                    'sink.column-types' = 'n_nationkey BIGINT, n_name VARCHAR(64), n_regionkey BIGINT',
                    'scan.partition.column' = 'n_nationkey',
                    'scan.partition.lower-bound' = '0',
                    'scan.partition.upper-bound' = '25',
                    'scan.partition.num' = '4')""")
      Ddl.execute(s,
        "INSERT INTO jdb_nation SELECT n_nationkey, n_name, n_regionkey FROM jsrc_nation")
      s.sql("""
        SELECT n_regionkey, count(*) AS n, min(n_name) AS first_name,
               sum(n_nationkey) AS key_sum
        FROM jdb_nation
        GROUP BY n_regionkey ORDER BY n_regionkey""")
    }),

    // CREATE TABLE ... LIKE (reference SqlTableLike, FLIP-110): the
    // derived table inherits physical columns and options from the
    // declared base and appends a computed column; querying it must
    // equal querying the source directly.
    "ddl_create_table_like" -> ((s, dir) => {
      Ddl.execute(s,
        s"""CREATE TABLE likeq_base (
              o_orderkey BIGINT, o_custkey BIGINT,
              o_orderpriority STRING, o_totalprice DOUBLE
            ) WITH ('connector' = 'filesystem',
                    'path' = '$dir/orders.parquet', 'format' = 'parquet')""")
      Ddl.execute(s,
        """CREATE TABLE likeq_rich (
             cents AS cast(floor(o_totalprice * 100) as bigint)
           ) LIKE likeq_base""")
      s.sql("""
        SELECT o_orderpriority, count(*) AS n, sum(cents) AS cents
        FROM likeq_rich
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")
    }),

    // PARTITIONED BY sink (reference SqlCreateTable partition keys +
    // filesystem connector): the INSERT lays one directory per
    // event_type, the read-back query's type filter prunes partitions
    // statically (plan-audited), and the aggregate matches the source.
    "ddl_partitioned_sink" -> ((s, dir) => {
      val out = java.nio.file.Files.createTempDirectory("graft_partsink").toString
      Ddl.execute(s,
        s"""CREATE TABLE psink_events (
              event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE
            ) WITH ('connector' = 'filesystem',
                    'path' = '$dir/events.parquet', 'format' = 'parquet')""")
      Ddl.execute(s,
        s"""CREATE TABLE psink_by_type (
              user_id BIGINT, cents BIGINT, event_type STRING
            ) PARTITIONED BY (event_type)
            WITH ('connector' = 'filesystem', 'path' = '$out', 'format' = 'parquet')""")
      Ddl.execute(s, """
        INSERT INTO psink_by_type
          SELECT user_id, cast(floor(value * 100) as bigint) AS cents, event_type
          FROM psink_events""")
      s.sql("""
        SELECT event_type, count(*) AS n, sum(cents) AS cents
        FROM psink_by_type
        WHERE event_type IN ('click', 'view')
        GROUP BY event_type ORDER BY event_type""")
    }),

    // ALTER TABLE ADD/DROP PARTITION (reference SqlAddPartitions /
    // SqlDropPartitions): DROP prunes a partition directory (the data
    // disappears from every subsequent read — a static prune), ADD
    // registers an empty partition that SHOW PARTITIONS lists. The
    // result joins the listed partitions against the surviving data.
    "ddl_alter_partition" -> ((s, dir) => {
      val out = java.nio.file.Files.createTempDirectory("graft_altpart").toString
      Ddl.execute(s,
        s"""CREATE TABLE ap_events (
              event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE
            ) WITH ('connector' = 'filesystem',
                    'path' = '$dir/events.parquet', 'format' = 'parquet')""")
      Ddl.execute(s,
        s"""CREATE TABLE ap_by_type (
              user_id BIGINT, cents BIGINT, event_type STRING
            ) PARTITIONED BY (event_type)
            WITH ('connector' = 'filesystem', 'path' = '$out', 'format' = 'parquet')""")
      Ddl.execute(s, """
        INSERT INTO ap_by_type
          SELECT user_id, cast(floor(value * 100) as bigint) AS cents, event_type
          FROM ap_events""")
      // prune one partition, register one empty partition; the
      // idempotent forms are exercised too
      Ddl.execute(s, "ALTER TABLE ap_by_type DROP PARTITION (event_type = 'click')")
      Ddl.execute(s,
        "ALTER TABLE ap_by_type DROP IF EXISTS PARTITION (event_type = 'click')")
      Ddl.execute(s, "ALTER TABLE ap_by_type ADD PARTITION (event_type = 'synthetic')")
      Ddl.execute(s,
        "ALTER TABLE ap_by_type ADD IF NOT EXISTS PARTITION (event_type = 'synthetic')")
      Ddl.execute(s, "SHOW PARTITIONS ap_by_type")
        .createOrReplaceTempView("ap_parts")
      s.sql("""
        SELECT p.`partition name` AS part,
               coalesce(a.n, 0) AS n, coalesce(a.cents, 0) AS cents
        FROM ap_parts p
        LEFT JOIN (
          SELECT concat('event_type=', event_type) AS part,
                 count(*) AS n, sum(cents) AS cents
          FROM ap_by_type GROUP BY event_type) a
        ON p.`partition name` = a.part
        ORDER BY part""")
    }),

    // Hive-dialect column DDL (reference SqlAddReplaceColumns /
    // SqlChangeColumn — the reference parses these; its in-memory
    // catalog rejects them; this catalog executes them): phase-1 rows
    // land under the ORIGINAL schema, then ADD COLUMNS (cents,
    // batch_no), CHANGE COLUMN event_type→etype (rename + reposition),
    // phase-2 rows land under the NEW schema, REPLACE COLUMNS drops
    // batch_no again. The final aggregate must see: renamed etype
    // across BOTH file generations (alias + coalesce), cents NULL on
    // phase-1 rows (typed-null backfill), batch_no gone.
    "ddl_alter_columns" -> ((s, dir) => {
      val store = java.nio.file.Files.createTempDirectory("graft_altcol").toString
      Ddl.execute(s,
        s"""CREATE TABLE ac_src (
              event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE
            ) WITH ('connector' = 'filesystem',
                    'path' = '$dir/events.parquet', 'format' = 'parquet')""")
      Ddl.execute(s,
        s"""CREATE TABLE ac_tab (
              event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE
            ) WITH ('connector' = 'filesystem', 'path' = '$store',
                    'format' = 'parquet')""")
      Ddl.execute(s, """
        INSERT INTO ac_tab
          SELECT event_id, user_id, event_type, value
          FROM ac_src WHERE event_id % 2 = 0""")
      Ddl.execute(s, """ALTER TABLE ac_tab ADD COLUMNS (
        cents BIGINT COMMENT 'value in integer cents', batch_no INT)""")
      Ddl.execute(s,
        "ALTER TABLE ac_tab CHANGE COLUMN event_type etype STRING AFTER user_id")
      Ddl.execute(s, """
        INSERT INTO ac_tab
          SELECT event_id, user_id, event_type AS etype, value,
                 cast(floor(value * 100) as bigint) AS cents, 2 AS batch_no
          FROM ac_src WHERE event_id % 2 = 1""")
      Ddl.execute(s, """ALTER TABLE ac_tab REPLACE COLUMNS (
        event_id BIGINT, user_id BIGINT, etype STRING, value DOUBLE, cents BIGINT)""")
      s.sql("""
        SELECT etype, count(*) AS n,
               sum(coalesce(cents, cast(0 as bigint))) AS cents_new,
               cast(sum(cast(floor(value * 100) as bigint)) as bigint) AS cents_all
        FROM ac_tab GROUP BY etype ORDER BY etype""")
    }),

    "ddl_statement_set" -> ((s, dir) => {
      val outA = java.nio.file.Files.createTempDirectory("graft_sset_a").toString
      val outB = java.nio.file.Files.createTempDirectory("graft_sset_b").toString
      Ddl.execute(s,
        s"""CREATE TABLE sset_events (
              event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE
            ) WITH ('connector' = 'filesystem',
                    'path' = '$dir/events.parquet', 'format' = 'parquet')""")
      Ddl.execute(s,
        s"""CREATE TABLE sset_by_type (event_type STRING, n BIGINT, cents BIGINT)
            WITH ('connector' = 'filesystem', 'path' = '$outA', 'format' = 'parquet')""")
      Ddl.execute(s,
        s"""CREATE TABLE sset_by_user (user_id BIGINT, n BIGINT, cents BIGINT)
            WITH ('connector' = 'filesystem', 'path' = '$outB', 'format' = 'parquet')""")
      Ddl.execute(s, """
        EXECUTE STATEMENT SET BEGIN
          INSERT INTO sset_by_type
            SELECT event_type, count(*) AS n,
                   sum(cast(floor(value * 100) as bigint)) AS cents
            FROM sset_events WHERE value >= 0.1 GROUP BY event_type;
          INSERT INTO sset_by_user
            SELECT user_id, count(*) AS n,
                   sum(cast(floor(value * 100) as bigint)) AS cents
            FROM sset_events WHERE value >= 0.1 GROUP BY user_id;
        END""")
      s.sql("""
        SELECT 'by_type' AS sink, event_type AS k, n, cents FROM sset_by_type
        UNION ALL
        SELECT 'by_user', cast(user_id AS string), n, cents FROM sset_by_user
        ORDER BY sink, k""")
    }),

    // STREAMING statement set (reference StreamStatementSet): the
    // source table is declared with scan.streaming, both INSERTs run
    // as bounded AvailableNow pipelines into declared parquet sinks,
    // and the read-back checks both legs. Stateless append queries —
    // the windowed-agg streaming paths are gated separately.
    "ddl_statement_set_stream" -> ((s, dir) => {
      val outA = java.nio.file.Files.createTempDirectory("graft_ssets_a").toString
      val outB = java.nio.file.Files.createTempDirectory("graft_ssets_b").toString
      Ddl.execute(s,
        s"""CREATE TABLE ssets_events (
              event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE
            ) WITH ('connector' = 'filesystem', 'path' = '$dir/events.parquet',
                    'format' = 'parquet', 'scan.streaming' = 'true')""")
      Ddl.execute(s,
        s"""CREATE TABLE ssets_clicks (event_id BIGINT, user_id BIGINT)
            WITH ('connector' = 'filesystem', 'path' = '$outA', 'format' = 'parquet')""")
      Ddl.execute(s,
        s"""CREATE TABLE ssets_big (event_id BIGINT, cents BIGINT)
            WITH ('connector' = 'filesystem', 'path' = '$outB', 'format' = 'parquet')""")
      Ddl.execute(s, """
        EXECUTE STATEMENT SET BEGIN
          INSERT INTO ssets_clicks
            SELECT event_id, user_id FROM ssets_events WHERE event_type = 'click';
          INSERT INTO ssets_big
            SELECT event_id, cast(floor(value * 100) as bigint) AS cents
            FROM ssets_events WHERE value >= 0.9;
        END""")
      s.sql("""
        SELECT 'clicks' AS sink, event_id, user_id AS v FROM ssets_clicks
        UNION ALL
        SELECT 'big', event_id, cents FROM ssets_big
        ORDER BY sink, event_id""")
    }),

    // INSERT OVERWRITE (reference SqlInsert's overwrite flag on batch
    // filesystem tables): seed the sink with one INSERT INTO, then
    // OVERWRITE it — the read-back must contain ONLY the second
    // statement's rows, proving replace-not-append semantics.
    "ddl_insert_overwrite" -> ((s, dir) => {
      val out = java.nio.file.Files.createTempDirectory("graft_iow").toString
      Ddl.execute(s,
        s"""CREATE TABLE iow_events (
              event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE
            ) WITH ('connector' = 'filesystem',
                    'path' = '$dir/events.parquet', 'format' = 'parquet')""")
      Ddl.execute(s,
        s"""CREATE TABLE iow_sink (event_type STRING, n BIGINT)
            WITH ('connector' = 'filesystem', 'path' = '$out', 'format' = 'parquet')""")
      Ddl.execute(s, """
        INSERT INTO iow_sink
          SELECT event_type, count(*) AS n FROM iow_events GROUP BY event_type""")
      Ddl.execute(s, """
        INSERT OVERWRITE iow_sink
          SELECT event_type, count(*) AS n FROM iow_events
          WHERE value >= 0.5 GROUP BY event_type""")
      s.sql("SELECT event_type, n FROM iow_sink ORDER BY event_type")
    }),

    // SHOW TABLES (reference ShowTablesOperation): lists everything the
    // session declared through the front-end — connector tables AND
    // views, sorted, as the reference's current-database listing. A
    // fresh session isolates the catalog from other gates.
    "ddl_show_tables" -> ((s0, dir) => {
      val s = s0.newSession()
      Ddl.execute(s,
        s"""CREATE TABLE showt_nation (n_nationkey INT, n_name STRING)
            WITH ('connector' = 'filesystem', 'path' = '$dir/nation.parquet',
                  'format' = 'parquet')""")
      Ddl.execute(s,
        s"""CREATE TABLE showt_region (r_regionkey INT, r_name STRING)
            WITH ('connector' = 'filesystem', 'path' = '$dir/region.parquet',
                  'format' = 'parquet')""")
      Ddl.execute(s,
        """CREATE VIEW showt_names AS SELECT n_name FROM showt_nation""")
      Ddl.execute(s, "SHOW TABLES")
    }),

    // DESCRIBE (reference DescribeTableOperation): the reference's
    // name/type/null/key/extras/watermark output — computed columns
    // show their RESOLVED type (BIGINT, derived by Catalyst from the
    // expression, not declared text) plus their defining expression in
    // extras; the watermark spec prints on its time column's row.
    "ddl_describe_table" -> ((s0, dir) => {
      val s = s0.newSession()
      Ddl.execute(s,
        s"""CREATE TABLE desc_orders (
              o_orderkey BIGINT,
              o_totalprice DOUBLE,
              o_orderdate TIMESTAMP_NTZ,
              total_cents AS CAST(floor(o_totalprice * 100) AS BIGINT),
              WATERMARK FOR o_orderdate AS o_orderdate - INTERVAL '5' SECOND
            ) WITH (
              'connector' = 'filesystem',
              'path' = '$dir/orders.parquet',
              'format' = 'parquet'
            )""")
      Ddl.execute(s, "DESCRIBE desc_orders")
        .orderBy(org.apache.spark.sql.functions.col("name"))
    }),

    // PRIMARY KEY … NOT ENFORCED (reference SqlTableConstraint — the
    // upsert sources/sinks key their changelog on it): declared in the
    // column list, surfaced as PRI(...) on the key rows of DESCRIBE,
    // and round-tripped through SHOW CREATE TABLE (spec-checked).
    "ddl_primary_key" -> ((s0, dir) => {
      val s = s0.newSession()
      Ddl.execute(s,
        s"""CREATE TABLE pk_orders (
              o_orderkey BIGINT,
              o_custkey BIGINT,
              o_totalprice DOUBLE,
              CONSTRAINT pk_ok PRIMARY KEY (o_orderkey, o_custkey) NOT ENFORCED
            ) WITH (
              'connector' = 'filesystem',
              'path' = '$dir/orders.parquet',
              'format' = 'parquet'
            )""")
      Ddl.execute(s, "DESCRIBE pk_orders")
        .orderBy(org.apache.spark.sql.functions.col("name"))
    }),

    // CREATE FUNCTION … AS 'class' (reference SqlCreateFunction +
    // ScalarFunction eval-by-reflection): both example classes register
    // through the DDL text and run inside a SQL query — a 1-arg
    // String→String and a 2-arg (Double, Long)→Long eval.
    "ddl_create_function" -> ((s0, dir) => {
      val s = s0.newSession()
      Ddl.execute(s,
        s"""CREATE TABLE fn_part (p_partkey BIGINT, p_name STRING, p_retailprice DOUBLE)
            WITH ('connector' = 'filesystem', 'path' = '$dir/part.parquet',
                  'format' = 'parquet')""")
      Ddl.execute(s,
        "CREATE TEMPORARY FUNCTION vowel_strip AS 'graft.functions.udfx.VowelStrip'")
      Ddl.execute(s,
        "CREATE FUNCTION cents_band AS 'graft.functions.udfx.CentsBand'")
      s.sql("""
        SELECT p_partkey, vowel_strip(p_name) AS bare_name,
               cents_band(p_retailprice, 50000L) AS band
        FROM fn_part ORDER BY p_partkey""")
    }),

    // Catalog namespaces (reference SqlCreateCatalog /
    // GenericInMemoryCatalog + SqlUseCatalog/SqlUseDatabase): the SAME
    // unqualified table name resolves to different tables in different
    // catalogs, switched by USE CATALOG — each frame is analyzed in
    // its own namespace, then the catalogs are dropped (lifecycle
    // exercised end-to-end in one session).
    "ddl_catalog_switch" -> ((s, dir) => {
      Ddl.execute(s, "CREATE CATALOG cat_a WITH ('type' = 'generic_in_memory')")
      Ddl.execute(s, "CREATE CATALOG cat_b WITH ('type' = 'generic_in_memory')")
      Ddl.execute(s, "USE CATALOG cat_a")
      Ddl.execute(s, "CREATE DATABASE mart")
      Ddl.execute(s, "USE mart")
      Ddl.execute(s, s"""CREATE TABLE t (o_orderkey BIGINT, o_totalprice DOUBLE)
        WITH ('connector'='filesystem','path'='$dir/orders.parquet','format'='parquet')""")
      val aFrame = s.sql("""
        SELECT 'cat_a' AS ns, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM t""")
      Ddl.execute(s, "USE CATALOG cat_b")
      Ddl.execute(s, s"""CREATE TABLE t (c_custkey BIGINT, c_acctbal DOUBLE)
        WITH ('connector'='filesystem','path'='$dir/customer.parquet','format'='parquet')""")
      val bFrame = s.sql("""
        SELECT 'cat_b' AS ns, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM t""")
      Ddl.execute(s, "USE CATALOG default_catalog")
      Ddl.execute(s, "DROP CATALOG cat_a")
      Ddl.execute(s, "DROP CATALOG cat_b")
      aFrame.unionAll(bFrame).orderBy("ns")
    }),

    // METADATA columns (reference SqlTableColumn.SqlMetadataColumn,
    // 1.14 DDL grammar: `col TYPE METADATA [FROM 'key'] [VIRTUAL]`):
    // connector metadata surfaces as declared columns — here the file
    // source's `_metadata` struct. The oracle pins the expected
    // basename (each testdata table is a single parquet file), so the
    // gate proves the column resolves from real scan metadata.
    "ddl_metadata_column" -> ((s, dir) => {
      Ddl.execute(s,
        s"""CREATE TABLE ev_meta (
              event_id BIGINT,
              user_id BIGINT,
              fname STRING METADATA FROM 'file_name' VIRTUAL,
              fsize BIGINT METADATA FROM 'file_size'
            ) WITH (
              'connector' = 'filesystem',
              'path' = '$dir/events.parquet',
              'format' = 'parquet'
            )""")
      s.sql("""
        SELECT fname, count(*) AS n, min(event_id) AS min_id,
               CAST(min(fsize) = max(fsize) AND min(fsize) > 0 AS BOOLEAN) AS size_consistent
        FROM ev_meta GROUP BY fname ORDER BY fname""")
    }),

    "ddl_csv_source" -> ((s, dir) => {
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_fmt/${dir.replaceAll("[^a-zA-Z0-9]", "_")}/ddl_supplier_csv"
      graft.Tables.load(s, dir, "supplier")
        .select("s_suppkey", "s_name", "s_nationkey")
        .write.mode("overwrite").option("header", "true").csv(path)
      Ddl.execute(s,
        s"""CREATE TABLE supplier_csv (
              s_suppkey BIGINT,
              s_name STRING,
              s_nationkey BIGINT
            ) WITH (
              'connector' = 'filesystem',
              'path' = '$path',
              'format' = 'csv',
              'csv.header' = 'true'
            )""")
      s.sql("""
        SELECT s_nationkey, count(*) AS n, min(s_name) AS first_name
        FROM supplier_csv GROUP BY s_nationkey ORDER BY s_nationkey""")
    }),

    // FLIP-113 dynamic table options (reference SqlHint /
    // `table.dynamic-table-options.enabled`): the same declared CSV
    // table read once with its WITH options (csv.header='false'
    // mis-reads the single header line as a null data row) and once
    // with a per-query `/*+ OPTIONS(...) */` hint correcting it —
    // extra_raw_rows = 1 proves the hint changed THIS query only.
    "ddl_options_hint" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_fmt/${dir.replaceAll("[^a-zA-Z0-9]", "_")}/ddl_nation_hint_csv"
      graft.Tables.load(s, dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .coalesce(1) // exactly ONE part file => exactly one header line
        .write.mode("overwrite").option("header", "true").csv(path)
      Ddl.execute(s,
        s"""CREATE TABLE nation_hint_csv (
              n_nationkey BIGINT,
              n_name STRING,
              n_regionkey BIGINT
            ) WITH (
              'connector' = 'filesystem',
              'path' = '$path',
              'format' = 'csv',
              'csv.header' = 'false'
            )""")
      val raw = s.sql("SELECT count(*) AS c FROM nation_hint_csv")
      Ddl.query(s, """
          SELECT count(*) AS n, sum(n_regionkey) AS region_sum
          FROM nation_hint_csv /*+ OPTIONS('csv.header' = 'true') */""")
        .crossJoin(broadcast(raw))
        .select(col("n"), col("region_sum"), (col("c") - col("n")).as("extra_raw_rows"))
    })
  )

  override def oracle: Map[String, String] = Map(
    "ddl_sql_pipeline" -> """
      SELECT l_returnflag, count(*) AS n,
             CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS net_cents,
             CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "ddl_create_view" -> """
      SELECT o_custkey, count(*) AS n,
             CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS spend_cents
      FROM orders WHERE o_orderpriority = '1-URGENT'
      GROUP BY o_custkey ORDER BY o_custkey""",
    "ddl_csv_source" -> """
      SELECT s_nationkey, count(*) AS n, min(s_name) AS first_name
      FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""",
    "ddl_options_hint" -> """
      SELECT count(*) AS n, CAST(sum(n_regionkey) AS BIGINT) AS region_sum,
             CAST(1 AS BIGINT) AS extra_raw_rows
      FROM nation""",
    "ddl_metadata_column" -> """
      SELECT 'events.parquet' AS fname, count(*) AS n,
             min(event_id) AS min_id, true AS size_consistent
      FROM events GROUP BY 1 ORDER BY fname""",
    "ddl_catalog_switch" -> """
      SELECT 'cat_a' AS ns, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM orders
      UNION ALL
      SELECT 'cat_b', CAST(count(*) AS BIGINT),
             CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT)
      FROM customer
      ORDER BY ns""",
    "ddl_create_function" -> """
      SELECT p_partkey,
             regexp_replace(p_name, '[aeiou]', '', 'g') AS bare_name,
             CAST(floor(CAST(floor(p_retailprice * 100) AS BIGINT) / 50000) AS BIGINT) AS band
      FROM part ORDER BY p_partkey""",
    "ddl_show_tables" -> """
      SELECT * FROM (VALUES ('showt_names'), ('showt_nation'), ('showt_region'))
        AS t(table_name)""",
    "ddl_describe_table" -> """
      SELECT * FROM (VALUES
        ('o_orderkey', 'BIGINT', true, CAST(NULL AS VARCHAR),
         CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)),
        ('o_totalprice', 'DOUBLE', true, CAST(NULL AS VARCHAR),
         CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)),
        ('o_orderdate', 'TIMESTAMP_NTZ', true, CAST(NULL AS VARCHAR),
         CAST(NULL AS VARCHAR), 'o_orderdate - INTERVAL ''5'' SECOND'),
        ('total_cents', 'BIGINT', true, CAST(NULL AS VARCHAR),
         'AS CAST(floor(o_totalprice * 100) AS BIGINT)', CAST(NULL AS VARCHAR))
      ) AS t(name, "type", "null", "key", extras, watermark)
      ORDER BY name""",
    "ddl_primary_key" -> """
      SELECT * FROM (VALUES
        ('o_orderkey', 'BIGINT', true, 'PRI(o_orderkey, o_custkey)',
         CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)),
        ('o_custkey', 'BIGINT', true, 'PRI(o_orderkey, o_custkey)',
         CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)),
        ('o_totalprice', 'DOUBLE', true, CAST(NULL AS VARCHAR),
         CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR))
      ) AS t(name, "type", "null", "key", extras, watermark)
      ORDER BY name""",
    "ddl_statement_set_stream" -> """
      SELECT 'clicks' AS sink, event_id, user_id AS v FROM events
      WHERE event_type = 'click'
      UNION ALL
      SELECT 'big', event_id, CAST(floor(value * 100) AS BIGINT)
      FROM events WHERE value >= 0.9
      ORDER BY sink, event_id""",
    "ddl_insert_overwrite" -> """
      SELECT event_type, count(*) AS n FROM events
      WHERE value >= 0.5 GROUP BY event_type ORDER BY event_type""",
    "ddl_jdbc_connector" -> """
      SELECT n_regionkey, count(*) AS n, min(n_name) AS first_name,
             CAST(sum(n_nationkey) AS BIGINT) AS key_sum
      FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""",
    "ddl_create_table_like" -> """
      SELECT o_orderpriority, count(*) AS n,
             CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM orders
      GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "ddl_partitioned_sink" -> """
      SELECT event_type, count(*) AS n,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events
      WHERE event_type IN ('click', 'view')
      GROUP BY event_type ORDER BY event_type""",
    "ddl_alter_partition" -> """
      WITH agg AS (
        SELECT 'event_type=' || event_type AS part, count(*) AS n,
               CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM events WHERE event_type <> 'click' GROUP BY event_type)
      SELECT part, n, cents FROM agg
      UNION ALL
      SELECT 'event_type=synthetic', CAST(0 AS BIGINT), CAST(0 AS BIGINT)
      ORDER BY part""",
    "ddl_alter_columns" -> """
      SELECT event_type AS etype, count(*) AS n,
             CAST(sum(CASE WHEN event_id % 2 = 1
                           THEN CAST(floor(value * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS cents_new,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents_all
      FROM events GROUP BY event_type ORDER BY etype""",
    "ddl_statement_set" -> """
      SELECT 'by_type' AS sink, event_type AS k, count(*) AS n,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events WHERE value >= 0.1 GROUP BY event_type
      UNION ALL
      SELECT 'by_user', CAST(user_id AS VARCHAR), count(*),
             CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
      FROM events WHERE value >= 0.1 GROUP BY user_id
      ORDER BY sink, k""",
    "ddl_char_padding" -> """
      SELECT n_nationkey, rpad(n_name, 12, ' ') AS name_pad,
             CAST(length(rpad(n_name, 12, ' ')) AS INT) AS len_pad,
             rpad(n_name, 6, ' ') AS name_cut,
             CAST(length(rpad(n_name, 6, ' ')) AS INT) AS len_cut
      FROM nation ORDER BY n_nationkey"""
  )
}
