package graft.sqlx

import graft.SparkSuite
import graft.streaming.StreamOps
import org.apache.spark.sql.functions._

/** DDL layer: parsing, computed columns, and the streaming WATERMARK
 * path end-to-end (DDL → file stream → window agg → memory sink). */
class DdlSpec extends SparkSuite {

  test("parse: physical + computed columns, watermark, options") {
    val t = Ddl.parse("""
      CREATE TABLE ev (
        event_id BIGINT,
        ts TIMESTAMP,
        v DOUBLE,
        cents AS floor(v * 100),
        WATERMARK FOR ts AS ts - INTERVAL '10' SECOND
      ) WITH ('connector' = 'filesystem', 'path' = '/x', 'format' = 'json',
              'scan.streaming' = 'true')""")
    assert(t.name == "ev")
    assert(t.physical.map(_.name) == Seq("event_id", "ts", "v"))
    assert(t.computed == Seq(Ddl.ComputedDef("cents", "floor(v * 100)")))
    assert(t.watermark.contains(Ddl.WatermarkDef("ts", "10 SECOND")))
    assert(t.options("format") == "json")
  }

  test("parse rejects malformed statements") {
    intercept[IllegalArgumentException](Ddl.parse("SELECT 1"))
    intercept[IllegalArgumentException](
      Ddl.execute(spark, "CREATE TABLE t (a BIGINT) WITH ('format' = 'parquet')"))
  }

  test("statement set rejects unknown targets and non-INSERT statements") {
    intercept[IllegalArgumentException](Ddl.execute(spark,
      "EXECUTE STATEMENT SET BEGIN INSERT INTO never_declared SELECT 1; END"))
    intercept[IllegalArgumentException](Ddl.execute(spark,
      "EXECUTE STATEMENT SET BEGIN SELECT 1; END"))
  }

  test("bare INSERT INTO writes a declared sink and refreshes its view") {
    val dir = "/root/testdata/sf0.001"
    val out = java.nio.file.Files.createTempDirectory("graft_ins").toString
    Ddl.execute(spark,
      s"""CREATE TABLE ins_src (event_id BIGINT, event_type STRING)
          WITH ('connector' = 'filesystem', 'path' = '$dir/events.parquet',
                'format' = 'parquet')""")
    Ddl.execute(spark,
      s"""CREATE TABLE ins_sink (event_type STRING, n BIGINT)
          WITH ('connector' = 'filesystem', 'path' = '$out', 'format' = 'parquet')""")
    val summary = Ddl.execute(spark,
      "INSERT INTO ins_sink SELECT event_type, count(*) AS n FROM ins_src GROUP BY event_type")
    val sinkRows = spark.table("ins_sink").count()
    assert(sinkRows > 0)
    assert(summary.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      == Seq(("ins_sink", sinkRows)))
  }

  test("SHOW VIEWS lists only views; DESCRIBE rejects undeclared tables") {
    val s = spark.newSession()
    val dir = "/root/testdata/sf0.001"
    Ddl.execute(s,
      s"""CREATE TABLE sv_nation (n_nationkey INT, n_name STRING)
          WITH ('connector' = 'filesystem', 'path' = '$dir/nation.parquet',
                'format' = 'parquet')""")
    Ddl.execute(s, "CREATE VIEW sv_names AS SELECT n_name FROM sv_nation")
    assert(Ddl.execute(s, "SHOW VIEWS").collect().map(_.getString(0)).toSeq
      === Seq("sv_names"))
    assert(Ddl.execute(s, "SHOW TABLES").collect().map(_.getString(0)).toSeq
      === Seq("sv_names", "sv_nation"))
    // an unknown name falls to Spark's native DESCRIBE, which raises
    // its own table-not-found error
    intercept[org.apache.spark.sql.AnalysisException](Ddl.execute(s, "DESCRIBE nope"))
  }

  test("DROP TABLE / DROP VIEW remove catalog entries; IF EXISTS is quiet") {
    val s = spark.newSession()
    val dir = "/root/testdata/sf0.001"
    Ddl.execute(s,
      s"""CREATE TABLE dropme (n_nationkey INT, n_name STRING)
          WITH ('connector' = 'filesystem', 'path' = '$dir/nation.parquet',
                'format' = 'parquet')""")
    Ddl.execute(s, "CREATE VIEW dropme_v AS SELECT n_name FROM dropme")
    assert(Ddl.execute(s, "SHOW TABLES").count() === 2)
    assert(Ddl.execute(s, "DROP VIEW dropme_v").collect()(0).getString(0) === "OK")
    Ddl.execute(s, "DROP TABLE dropme")
    assert(Ddl.execute(s, "SHOW TABLES").count() === 0)
    // the temp views are gone from the session catalog too
    assert(!s.catalog.tableExists("dropme") && !s.catalog.tableExists("dropme_v"))
    // undeclared names fall through to Spark's native DROP — its own
    // unknown-name error, and native IF EXISTS stays quiet
    intercept[org.apache.spark.sql.AnalysisException](Ddl.execute(s, "DROP TABLE dropme"))
    intercept[org.apache.spark.sql.AnalysisException](Ddl.execute(s, "DROP VIEW dropme_v"))
    Ddl.execute(s, "DROP TABLE IF EXISTS dropme") // quiet
    Ddl.execute(s, "DROP VIEW IF EXISTS dropme_v") // quiet
    // a temp view created OUTSIDE the front-end still drops natively
    s.sql("SELECT 1 AS one").createOrReplaceTempView("outside_v")
    Ddl.execute(s, "DROP VIEW outside_v")
    assert(!s.catalog.tableExists("outside_v"))
  }

  test("PARTITIONED BY parses, validates, and round-trips via SHOW CREATE TABLE") {
    val t = Ddl.parse("""
      CREATE TABLE p (a BIGINT, b STRING, cents AS floor(a * 100),
        WATERMARK FOR ts AS ts - INTERVAL '5' SECOND, ts TIMESTAMP)
      PARTITIONED BY (b) WITH ('path' = '/x', 'format' = 'parquet')""")
    assert(t.partitionedBy == Seq("b"))
    intercept[IllegalArgumentException](Ddl.parse(
      "CREATE TABLE p (a BIGINT) PARTITIONED BY (nope) WITH ('path' = '/x')"))
    // SHOW CREATE reconstruction parses back to the identical definition
    val out = java.nio.file.Files.createTempDirectory("graft_showcreate").toString
    Ddl.execute(spark, s"""CREATE TABLE sc_t (a BIGINT, b STRING, cents AS floor(a * 100))
      PARTITIONED BY (b) WITH ('path' = '$out', 'format' = 'parquet')""")
    val shown = Ddl.execute(spark, "SHOW CREATE TABLE sc_t")
      .collect().head.getString(1)
    assert(Ddl.parse(shown) == Ddl.parse(shown.trim)) // parses at all
    val rt = Ddl.parse(shown)
    assert(rt.physical.map(_.name) == Seq("a", "b") &&
      rt.computed.head.name == "cents" && rt.partitionedBy == Seq("b") &&
      rt.options("path") == out)
  }

  test("reference type names normalize: TIMESTAMP(p), TIMESTAMP_LTZ, ROW, MULTISET") {
    val t = Ddl.parse("""
      CREATE TABLE types_t (
        ts3 TIMESTAMP(3),
        tl TIMESTAMP_LTZ(3),
        tlz TIMESTAMP(6) WITH LOCAL TIME ZONE,
        r ROW<a INT, b STRING>,
        ms MULTISET<STRING>,
        nested ARRAY<ROW<x INT, tags MULTISET<STRING>>>,
        c CHAR(4),
        d DECIMAL(10,2)
      ) WITH ('path' = '/x', 'format' = 'parquet')""")
    val types = t.physical.map(c => c.name -> c.typ).toMap
    assert(types("ts3") == "TIMESTAMP_NTZ")
    assert(types("tl") == "TIMESTAMP" && types("tlz") == "TIMESTAMP")
    assert(types("r") == "STRUCT<a INT, b STRING>")
    assert(types("ms") == "MAP<STRING, INT>")
    assert(types("nested") == "ARRAY<STRUCT<x INT, tags MAP<STRING, INT>>>")
    // types Spark already accepts are untouched
    assert(types("c") == "CHAR(4)" && types("d") == "DECIMAL(10,2)")
    // the normalized text resolves through Spark's DDL parser — a
    // declared-but-empty table materializes the translated schema
    val out = java.nio.file.Files.createTempDirectory("graft_types").toString
    Ddl.execute(spark, s"""CREATE TABLE types_exec (
        ts3 TIMESTAMP(3), r ROW<a INT, b STRING>, ms MULTISET<STRING>
      ) WITH ('path' = '$out', 'format' = 'parquet')""")
    val schema = spark.table("types_exec").schema
    import org.apache.spark.sql.types._
    assert(schema("ts3").dataType == TimestampNTZType)
    assert(schema("r").dataType.isInstanceOf[StructType])
    assert(schema("ms").dataType == MapType(StringType, IntegerType))
    Ddl.execute(spark, "DROP TABLE types_exec")
  }

  test("PRIMARY KEY NOT ENFORCED: parse, DESCRIBE PRI column, round-trip, ALTER lifecycle") {
    val out = java.nio.file.Files.createTempDirectory("graft_pk").toString
    import spark.implicits._
    Seq((1L, "a", 2.0)).toDF("id", "name", "v").write.mode("overwrite").parquet(out)
    Ddl.execute(spark, s"""CREATE TABLE pk_t (
        id BIGINT, name STRING, v DOUBLE,
        CONSTRAINT pk_id PRIMARY KEY (id) NOT ENFORCED
      ) WITH ('path' = '$out', 'format' = 'parquet')""")
    // enforced mode is rejected, as the reference
    intercept[IllegalArgumentException](Ddl.parse(
      "CREATE TABLE bad (id BIGINT, PRIMARY KEY (id)) WITH ('path' = '/x')"))
    intercept[IllegalArgumentException](Ddl.parse(
      "CREATE TABLE bad (id BIGINT, PRIMARY KEY (nope) NOT ENFORCED) WITH ('path' = '/x')"))
    // DESCRIBE: PRI(...) on the key row only
    val desc = Ddl.execute(spark, "DESCRIBE pk_t").collect()
      .map(r => r.getString(0) -> r.getString(3)).toMap
    assert(desc("id") == "PRI(id)" && desc("name") == null)
    // SHOW CREATE TABLE round-trips the constraint INCLUDING its
    // declared name (the reference re-emits `CONSTRAINT pk_id …`)
    val shown = Ddl.execute(spark, "SHOW CREATE TABLE pk_t").collect().head.getString(1)
    assert(Ddl.parse(shown).primaryKey == Seq("id"), shown)
    assert(Ddl.parse(shown).pkName.contains("pk_id"), shown)
    // ALTER lifecycle: drop, re-add composite, duplicate add rejected
    Ddl.execute(spark, "ALTER TABLE pk_t DROP CONSTRAINT pk_id")
    assert(Ddl.parse(Ddl.execute(spark, "SHOW CREATE TABLE pk_t")
      .collect().head.getString(1)).primaryKey.isEmpty)
    Ddl.execute(spark,
      "ALTER TABLE pk_t ADD CONSTRAINT pk2 PRIMARY KEY (id, name) NOT ENFORCED")
    val readded = Ddl.parse(Ddl.execute(spark, "SHOW CREATE TABLE pk_t")
      .collect().head.getString(1))
    assert(readded.primaryKey == Seq("id", "name"))
    assert(readded.pkName.contains("pk2"))
    intercept[IllegalArgumentException](Ddl.execute(spark,
      "ALTER TABLE pk_t ADD PRIMARY KEY (id) NOT ENFORCED"))
    Ddl.execute(spark, "DROP TABLE pk_t")
  }

  test("SHOW [USER] FUNCTIONS, SHOW PARTITIONS, DESCRIBE CATALOG/DATABASE") {
    import spark.implicits._
    // functions: CREATE FUNCTION surfaces under USER; DROP removes it
    Ddl.execute(spark,
      "CREATE FUNCTION shf_fn AS 'graft.functions.udfx.VowelStrip'")
    val userFns = Ddl.execute(spark, "SHOW USER FUNCTIONS")
      .collect().map(_.getString(0)).toSet
    assert(userFns.contains("shf_fn"))
    val allFns = Ddl.execute(spark, "SHOW FUNCTIONS")
      .collect().map(_.getString(0)).toSet
    assert(allFns.contains("shf_fn") && allFns.contains("sum"),
      "plain SHOW FUNCTIONS lists system + user functions")
    Ddl.execute(spark, "DROP FUNCTION shf_fn")
    assert(!Ddl.execute(spark, "SHOW USER FUNCTIONS")
      .collect().map(_.getString(0)).contains("shf_fn"))
    // partitions of a PARTITIONED BY table
    val out = java.nio.file.Files.createTempDirectory("graft_showpart").toString
    Seq((1L, "x"), (2L, "y"), (3L, "x")).toDF("id", "part")
      .write.mode("overwrite").partitionBy("part").parquet(out)
    Ddl.execute(spark, s"""CREATE TABLE sp_t (id BIGINT, part STRING)
      PARTITIONED BY (part) WITH ('path' = '$out', 'format' = 'parquet')""")
    val parts = Ddl.execute(spark, "SHOW PARTITIONS sp_t")
      .collect().map(_.getString(0)).toSeq
    assert(parts == Seq("part=x", "part=y"), parts.toString)
    intercept[Exception]( // undeclared → native Spark path → not found
      Ddl.execute(spark, "SHOW PARTITIONS never_declared_t"))
    Ddl.execute(spark, "DROP TABLE sp_t")
    // catalog / database info rows
    val cat = Ddl.execute(spark, "DESCRIBE CATALOG default_catalog")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(cat("name") == "default_catalog" && cat("type") == "generic_in_memory")
    val db = Ddl.execute(spark, "DESCRIBE DATABASE default_database")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(db("name") == "default_database" && db("catalog") == "default_catalog")
    intercept[IllegalArgumentException](
      Ddl.execute(spark, "DESCRIBE CATALOG no_such_cat"))
  }

  test("CREATE TABLE LIKE: inherit, append columns, option merge strategies") {
    val out = java.nio.file.Files.createTempDirectory("graft_like").toString
    import spark.implicits._
    Seq((1L, 1.5), (2L, 2.5)).toDF("a", "b").write.parquet(s"$out/base")
    Seq.empty[(Long, Double, String)].toDF("a", "b", "extra").write.parquet(s"$out/d")
    Seq.empty[(Long, Double)].toDF("a", "b").write.parquet(s"$out/e")
    Ddl.execute(spark, s"""CREATE TABLE like_base (a BIGINT, b DOUBLE, c2 AS floor(b * 10))
      WITH ('path' = '$out/base', 'format' = 'parquet')""")
    // duplicate option without OVERWRITING OPTIONS → loud
    intercept[IllegalArgumentException](Ddl.execute(spark,
      s"CREATE TABLE like_bad WITH ('path' = '$out/d') LIKE like_base"))
    // overwriting path + extra column inherits the rest
    Ddl.execute(spark, s"""CREATE TABLE like_d (extra STRING)
      WITH ('path' = '$out/d') LIKE like_base (OVERWRITING OPTIONS)""")
    val shown = Ddl.execute(spark, "SHOW CREATE TABLE like_d")
      .collect().head.getString(1)
    val d = Ddl.parse(shown)
    assert(d.physical.map(_.name) == Seq("a", "b", "extra"))
    assert(d.computed.map(_.name) == Seq("c2"))
    assert(d.options("path") == s"$out/d" && d.options("format") == "parquet")
    // EXCLUDING GENERATED drops the computed column
    Ddl.execute(spark, s"""CREATE TABLE like_e WITH ('path' = '$out/e')
      LIKE like_base (OVERWRITING OPTIONS, EXCLUDING GENERATED)""")
    val e = Ddl.parse(Ddl.execute(spark, "SHOW CREATE TABLE like_e")
      .collect().head.getString(1))
    assert(e.computed.isEmpty && e.physical.map(_.name) == Seq("a", "b"))
    // unknown base and unknown feature are loud
    intercept[IllegalArgumentException](Ddl.execute(spark,
      "CREATE TABLE x WITH ('p' = '1') LIKE never_declared"))
    intercept[IllegalArgumentException](Ddl.execute(spark,
      s"CREATE TABLE x WITH ('z' = '1') LIKE like_base (INCLUDING NONSENSE)"))
  }

  test("ALTER TABLE RENAME/SET/RESET and session SET/RESET") {
    val out = java.nio.file.Files.createTempDirectory("graft_alter").toString
    import spark.implicits._
    Seq((1L, 2.0), (2L, 4.0)).toDF("a", "b").write.parquet(s"$out/t")
    Ddl.execute(spark, s"""CREATE TABLE alt_a (a BIGINT, b DOUBLE)
      WITH ('path' = '$out/t', 'format' = 'parquet', 'note' = 'x')""")
    Ddl.execute(spark, "ALTER TABLE alt_a RENAME TO alt_b")
    assert(spark.sql("SELECT count(*) FROM alt_b").collect().head.getLong(0) == 2)
    intercept[Exception](spark.sql("SELECT * FROM alt_a")) // old name gone
    // SET merges options (visible via SHOW CREATE); RESET removes
    Ddl.execute(spark, "ALTER TABLE alt_b SET ('note' = 'y', 'extra' = 'z')")
    val t1 = Ddl.parse(Ddl.execute(spark, "SHOW CREATE TABLE alt_b")
      .collect().head.getString(1))
    assert(t1.options("note") == "y" && t1.options("extra") == "z")
    Ddl.execute(spark, "ALTER TABLE alt_b RESET ('extra')")
    val t2 = Ddl.parse(Ddl.execute(spark, "SHOW CREATE TABLE alt_b")
      .collect().head.getString(1))
    assert(!t2.options.contains("extra"))
    intercept[IllegalArgumentException](
      Ddl.execute(spark, "ALTER TABLE alt_b RESET ('path')"))
    // session config through the SQL door (SqlSet/SqlReset)
    Ddl.execute(spark, "SET 'spark.graft.ddlspec.flag' = 'on'")
    assert(spark.conf.get("spark.graft.ddlspec.flag") == "on")
    Ddl.execute(spark, "RESET 'spark.graft.ddlspec.flag'")
    assert(spark.conf.getOption("spark.graft.ddlspec.flag").isEmpty)
  }

  test("introspection variants the front-end does not own execute natively") {
    val s = spark.newSession()
    s.sql("SELECT 1 AS one").createOrReplaceTempView("nat_v")
    // DESCRIBE of a non-declared view → Spark's native DESCRIBE output
    val d = Ddl.execute(s, "DESCRIBE nat_v")
    assert(d.columns.contains("col_name"))
    // SHOW TABLES LIKE and EXPLAIN FORMATTED parse natively too
    assert(Ddl.execute(s, "SHOW TABLES LIKE 'nat*'").count() === 1)
    val ef = Ddl.execute(s, "EXPLAIN FORMATTED SELECT * FROM nat_v")
      .collect()(0).getString(0)
    assert(ef.contains("Physical Plan"))
  }

  test("CREATE FUNCTION rejects unknown classes and wrong eval shapes") {
    val s = spark.newSession()
    val e1 = intercept[IllegalArgumentException](
      Ddl.execute(s, "CREATE FUNCTION f AS 'no.such.Clazz'"))
    assert(e1.getMessage.contains("not found"))
    // a facade class with no public eval
    val e2 = intercept[IllegalArgumentException](
      Ddl.execute(s, "CREATE FUNCTION f AS 'graft.api.ScalarFunction'"))
    assert(e2.getMessage.contains("eval"))
  }

  test("EXPLAIN returns the optimized and physical plans of the statement") {
    val s = spark.newSession()
    val dir = "/root/testdata/sf0.001"
    Ddl.execute(s,
      s"""CREATE TABLE ex_nation (n_nationkey INT, n_name STRING)
          WITH ('connector' = 'filesystem', 'path' = '$dir/nation.parquet',
                'format' = 'parquet')""")
    val plan = Ddl.execute(s,
      "EXPLAIN PLAN FOR SELECT n_name FROM ex_nation WHERE n_nationkey > 3")
      .collect()(0).getString(0)
    assert(plan.contains("== Optimized Logical Plan =="), plan)
    assert(plan.contains("== Physical Plan =="), plan)
    // the filter must be visible as pushed work, not a bare table scan
    assert(plan.contains("n_nationkey"), plan)
  }

  test("EXPLAIN detail modes: ESTIMATED_COST, CHANGELOG_MODE, JSON_EXECUTION_PLAN") {
    val s = spark.newSession()
    val dir = "/root/testdata/sf0.001"
    Ddl.execute(s,
      s"""CREATE TABLE exd_nation (n_nationkey INT, n_name STRING)
          WITH ('connector' = 'filesystem', 'path' = '$dir/nation.parquet',
                'format' = 'parquet')""")
    val plan = Ddl.execute(s,
      "EXPLAIN ESTIMATED_COST, CHANGELOG_MODE, JSON_EXECUTION_PLAN " +
      "SELECT n_name, count(*) AS n FROM exd_nation GROUP BY n_name")
      .collect()(0).getString(0)
    assert(plan.contains("== Estimated Cost ==") && plan.contains("Statistics("), plan)
    // the aggregate is update-producing under the streaming rules;
    // its input scan is insert-only
    assert(plan.contains("== Changelog Mode ==") &&
      plan.contains("Aggregate(changelogMode=[I,UB,UA])") &&
      plan.contains("changelogMode=[I])"), plan)
    assert(plan.contains("== JSON Execution Plan ==") &&
      plan.contains("\"class\""), plan)
    // a single detail works too, and a plain projection is insert-only
    val p2 = Ddl.execute(s,
      "EXPLAIN CHANGELOG_MODE SELECT n_name FROM exd_nation")
      .collect()(0).getString(0)
    assert(p2.contains("== Changelog Mode ==") && !p2.contains("[I,UB,UA]"), p2)
  }

  test("streaming DDL with watermark: windowed agg equals batch twin") {
    val dir = "/root/testdata/sf0.001"
    // events.parquet has stored ts as int64 nanos in some driver
    // generations and as parquet TIMESTAMP in others (StreamOps.readStream
    // carries the same guard); declare the physical type the file
    // actually has, and let the computed column turn it into the
    // event-time timestamp the watermark rides on
    val tsIsLong = spark.read.parquet(s"$dir/events.parquet")
      .schema("ts").dataType == org.apache.spark.sql.types.LongType
    val (tsType, evExpr) =
      if (tsIsLong) ("BIGINT", "cast(timestamp_micros(ts div 1000) as timestamp)")
      else ("TIMESTAMP", "cast(ts as timestamp)")
    Ddl.execute(spark,
      s"""CREATE TABLE events_stream (
            event_id BIGINT, user_id BIGINT, event_type STRING,
            ts $tsType, value DOUBLE,
            event_time AS $evExpr,
            WATERMARK FOR event_time AS event_time - INTERVAL '60' SECOND
          ) WITH ('connector' = 'filesystem',
                  'path' = '$dir/events.parquet',
                  'format' = 'parquet',
                  'scan.streaming' = 'true')""")
    val agg = spark.sql("""
      SELECT window(event_time, '15 minutes').start AS ws, event_type,
             count(*) AS n
      FROM events_stream GROUP BY 1, 2""")
    assert(agg.isStreaming)
    val streamed = StreamOps.runToBatch(spark, agg, "complete", "t_ddl_stream")
      .orderBy("ws", "event_type").collect().toSeq
    val batch = graft.Tables.load(spark, dir, "events")
      .withColumn("event_time", col("ts").cast("timestamp"))
      .groupBy(window(col("event_time"), "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("ws"), col("event_type"), col("n"))
      .orderBy("ws", "event_type").collect().toSeq
    assert(streamed == batch)
  }

  test("watermark offset may be a constant interval EXPRESSION") {
    val dir = "/root/testdata/sf0.001"
    val tsIsLong = spark.read.parquet(s"$dir/events.parquet")
      .schema("ts").dataType == org.apache.spark.sql.types.LongType
    val (tsType, evExpr) =
      if (tsIsLong) ("BIGINT", "cast(timestamp_micros(ts div 1000) as timestamp)")
      else ("TIMESTAMP", "cast(ts as timestamp)")
    val df = Ddl.execute(spark,
      s"""CREATE TABLE events_stream_wmx (
            event_id BIGINT, ts $tsType,
            event_time AS $evExpr,
            WATERMARK FOR event_time AS event_time - INTERVAL '30' SECOND * 2
          ) WITH ('connector' = 'filesystem',
                  'path' = '$dir/events.parquet',
                  'format' = 'parquet',
                  'scan.streaming' = 'true')""")
    val delayUs = df.queryExecution.analyzed.collectFirst {
      case e: org.apache.spark.sql.catalyst.plans.logical.EventTimeWatermark =>
        e.delay.days * 86400000000L + e.delay.microseconds
    }
    assert(delayUs.contains(60000000L), s"expected a 60s delay, got $delayUs")
    // non-constant or non-interval offsets stay loud
    intercept[Exception] {
      Ddl.execute(spark,
        s"""CREATE TABLE events_stream_wmbad (
              event_id BIGINT, ts $tsType,
              event_time AS $evExpr,
              WATERMARK FOR event_time AS event_time - 5
            ) WITH ('connector' = 'filesystem',
                    'path' = '$dir/events.parquet',
                    'format' = 'parquet',
                    'scan.streaming' = 'true')""")
    }
  }

  test("METADATA columns: parse, file _metadata resolution, round-trip, DESCRIBE") {
    val t = Ddl.parse("""
      CREATE TABLE m (
        id BIGINT,
        fname STRING METADATA FROM 'file_name' VIRTUAL,
        file_size BIGINT METADATA
      ) WITH ('connector' = 'filesystem', 'path' = '/x', 'format' = 'parquet')""")
    assert(t.metadata == Seq(
      Ddl.MetadataDef("fname", "STRING", "file_name", virtual = true),
      Ddl.MetadataDef("file_size", "BIGINT", "file_size", virtual = false)))
    // end-to-end on a real file: the column carries the scan's basename
    val dir = java.nio.file.Files.createTempDirectory("ddl_meta").toString
    spark.range(5).toDF("id").coalesce(1).write.mode("overwrite").parquet(dir)
    Ddl.execute(spark, s"""
      CREATE TABLE meta_t (
        id BIGINT,
        fname STRING METADATA FROM 'file_name' VIRTUAL,
        file_size BIGINT METADATA
      ) WITH ('connector' = 'filesystem', 'path' = '$dir', 'format' = 'parquet')""")
    val rows = spark.sql(
      "SELECT DISTINCT fname, file_size > 0 FROM meta_t").collect()
    assert(rows.length == 1 && rows(0).getString(0).endsWith(".parquet")
      && rows(0).getBoolean(1), rows.toSeq)
    // SHOW CREATE round-trips through parse; DESCRIBE shows the key
    val ddlText = Ddl.execute(spark, "SHOW CREATE TABLE meta_t")
      .collect()(0).getString(1)
    assert(Ddl.parse(ddlText).metadata == Seq(
      Ddl.MetadataDef("fname", "STRING", "file_name", virtual = true),
      Ddl.MetadataDef("file_size", "BIGINT", "file_size", virtual = false)), ddlText)
    assert(ddlText.contains("METADATA FROM 'file_name' VIRTUAL"), ddlText)
    val desc = Ddl.execute(spark, "DESCRIBE meta_t").collect()
      .map(r => r.getString(0) -> r.getString(4)).toMap
    assert(desc("fname") == "METADATA FROM 'file_name' VIRTUAL", desc)
    assert(desc("file_size") == "METADATA FROM 'file_size'", desc)
  }

  test("catalog lifecycle: CREATE/USE/SHOW/DROP catalogs and databases, DROP FUNCTION") {
    def one(sql: String): String =
      Ddl.execute(spark, sql).collect()(0).getString(0)
    assert(one("SHOW CURRENT CATALOG") == "default_catalog")
    assert(one("SHOW CURRENT DATABASE") == "default_database")
    Ddl.execute(spark, "CREATE CATALOG spec_cat WITH ('type' = 'generic_in_memory')")
    // duplicate name and unsupported type are loud
    intercept[IllegalArgumentException](
      Ddl.execute(spark, "CREATE CATALOG spec_cat WITH ('type' = 'generic_in_memory')"))
    intercept[IllegalArgumentException](
      Ddl.execute(spark, "CREATE CATALOG h WITH ('type' = 'hive')"))
    assert(Ddl.execute(spark, "SHOW CATALOGS").collect().map(_.getString(0)).toSet
      .contains("spec_cat"))
    Ddl.execute(spark, "USE CATALOG spec_cat")
    // GenericInMemoryCatalog's default database
    assert(one("SHOW CURRENT DATABASE") == "default")
    Ddl.execute(spark, "CREATE DATABASE mart")
    Ddl.execute(spark, "CREATE DATABASE IF NOT EXISTS mart") // quiet
    intercept[IllegalArgumentException](Ddl.execute(spark, "CREATE DATABASE mart"))
    assert(Ddl.execute(spark, "SHOW DATABASES").collect().map(_.getString(0)).toSeq
      == Seq("default", "mart"))
    Ddl.execute(spark, "USE mart")
    assert(one("SHOW CURRENT DATABASE") == "mart")
    // a table filed under spec_cat.mart hides/surfaces with USE
    val dir = java.nio.file.Files.createTempDirectory("ddl_cat").toString
    spark.range(3).toDF("id").write.mode("overwrite").parquet(dir)
    Ddl.execute(spark, s"""CREATE TABLE cat_t (id BIGINT)
      WITH ('connector'='filesystem','path'='$dir','format'='parquet')""")
    assert(spark.sql("SELECT count(*) FROM cat_t").collect()(0).getLong(0) == 3)
    Ddl.execute(spark, "USE CATALOG default_catalog")
    assert(!spark.catalog.tableExists("cat_t")) // hidden with its namespace
    Ddl.execute(spark, "USE CATALOG spec_cat")
    // USE CATALOG lands on the catalog's default db; re-enter mart
    assert(one("SHOW CURRENT DATABASE") == "default")
    Ddl.execute(spark, "USE mart")
    assert(spark.sql("SELECT count(*) FROM cat_t").collect()(0).getLong(0) == 3)
    // drop protections: current catalog/database, non-empty database
    intercept[IllegalArgumentException](Ddl.execute(spark, "DROP CATALOG spec_cat"))
    intercept[IllegalArgumentException](Ddl.execute(spark, "DROP DATABASE mart"))
    Ddl.execute(spark, "USE default")
    intercept[IllegalArgumentException](Ddl.execute(spark, "DROP DATABASE mart"))
    Ddl.execute(spark, "DROP DATABASE mart CASCADE")
    Ddl.execute(spark, "USE CATALOG default_catalog")
    Ddl.execute(spark, "DROP CATALOG spec_cat")
    intercept[IllegalArgumentException](Ddl.execute(spark, "USE CATALOG spec_cat"))
    // DROP FUNCTION unregisters a CREATE FUNCTION'd UDF
    Ddl.execute(spark,
      "CREATE FUNCTION spec_strip AS 'graft.functions.udfx.VowelStrip'")
    assert(spark.sql("SELECT spec_strip('graft') AS x").collect()(0).getString(0) == "grft")
    Ddl.execute(spark, "DROP FUNCTION spec_strip")
    intercept[Exception](spark.sql("SELECT spec_strip('graft')"))
    Ddl.execute(spark, "DROP FUNCTION IF EXISTS spec_strip") // quiet
    intercept[IllegalArgumentException](Ddl.execute(spark, "DROP FUNCTION spec_strip"))
  }

  test("ALTER FUNCTION/DATABASE/VIEW: re-point, properties, rename, redefine") {
    val s = spark.newSession()
    // ALTER FUNCTION re-points the implementation class
    Ddl.execute(s, "CREATE FUNCTION alt_fn AS 'graft.functions.udfx.VowelStrip'")
    assert(s.sql("SELECT alt_fn('graft') AS x").collect()(0).getString(0) == "grft")
    Ddl.execute(s, "ALTER FUNCTION alt_fn AS 'graft.functions.udfx.CentsBand'")
    assert(s.sql("SELECT alt_fn(CAST(1.25 AS DOUBLE), CAST(10 AS BIGINT)) AS x").collect()(0).getLong(0) == 12L)
    intercept[IllegalArgumentException](
      Ddl.execute(s, "ALTER FUNCTION nope AS 'graft.functions.udfx.VowelStrip'"))
    Ddl.execute(s, "ALTER FUNCTION IF EXISTS nope AS 'x.Y'") // quiet
    // ALTER DATABASE merges properties, read via the catalog-API analog
    Ddl.execute(s, "CREATE DATABASE alt_db")
    Ddl.execute(s, "ALTER DATABASE alt_db SET ('owner' = 'graft', 'tier' = 'gold')")
    Ddl.execute(s, "ALTER DATABASE alt_db SET ('tier' = 'silver')")
    assert(Ddl.databaseProps(s, "alt_db") == Map("owner" -> "graft", "tier" -> "silver"))
    intercept[IllegalArgumentException](
      Ddl.execute(s, "ALTER DATABASE no_db SET ('a' = 'b')"))
    // ALTER VIEW RENAME TO and AS over a front-end view
    val dir = "/root/testdata/sf0.001"
    Ddl.execute(s, s"""CREATE TABLE av_nation (n_nationkey INT, n_name STRING)
      WITH ('connector'='filesystem','path'='$dir/nation.parquet','format'='parquet')""")
    Ddl.execute(s, "CREATE VIEW av_v AS SELECT n_name FROM av_nation")
    Ddl.execute(s, "ALTER VIEW av_v RENAME TO av_v2")
    assert(!s.catalog.tableExists("av_v") && s.catalog.tableExists("av_v2"))
    assert(s.table("av_v2").columns.toSeq == Seq("n_name"))
    Ddl.execute(s, "ALTER VIEW av_v2 AS SELECT n_nationkey, n_name FROM av_nation")
    assert(s.table("av_v2").columns.toSeq == Seq("n_nationkey", "n_name"))
  }

  test("modules: SHOW/LOAD/UNLOAD core genuinely toggle function resolution") {
    val s = spark.newSession()
    graft.functions.GraftFunctions.register(s)
    assert(Ddl.execute(s, "SHOW MODULES").collect().map(_.getString(0)).toSeq == Seq("core"))
    assert(Ddl.execute(s, "SHOW FULL MODULES").collect()
      .map(r => (r.getString(0), r.getBoolean(1))).toSeq == Seq(("core", true)))
    assert(s.sql("SELECT is_digit('7') AS x").collect()(0).getBoolean(0))
    intercept[IllegalArgumentException](Ddl.execute(s, "LOAD MODULE core")) // already loaded
    intercept[IllegalArgumentException](Ddl.execute(s, "LOAD MODULE hive")) // unknown
    Ddl.execute(s, "UNLOAD MODULE core")
    assert(Ddl.execute(s, "SHOW MODULES").count() == 0)
    intercept[Exception](s.sql("SELECT is_digit('7')")) // really gone
    intercept[IllegalArgumentException](Ddl.execute(s, "UNLOAD MODULE core")) // not loaded
    Ddl.execute(s, "LOAD MODULE core")
    assert(s.sql("SELECT is_digit('7') AS x").collect()(0).getBoolean(0)) // back
  }

  test("OPTIONS hint: per-statement option merge, declared table untouched, loud on unknown names") {
    val s = spark
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_fmt/ddlspec_hint_csv"
    import s.implicits._
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").option("header", "true").csv(path)
    Ddl.execute(s,
      s"""CREATE TABLE hint_t (k BIGINT, v STRING) WITH (
            'connector' = 'filesystem', 'path' = '$path',
            'format' = 'csv', 'csv.header' = 'false')""")
    // declared options: the header line arrives as a null row
    assert(s.sql("SELECT count(*) AS c FROM hint_t").collect()(0).getLong(0) == 4L)
    // hinted statement: merged options skip the header
    assert(Ddl.query(s,
      "SELECT count(*) AS c FROM hint_t /*+ OPTIONS('csv.header' = 'true') */")
      .collect()(0).getLong(0) == 3L)
    // the hint was per-statement: the declared table still mis-reads
    assert(s.sql("SELECT count(*) AS c FROM hint_t").collect()(0).getLong(0) == 4L)
    // un-hinted statements pass through query() untouched
    assert(Ddl.query(s, "SELECT count(*) AS c FROM hint_t").collect()(0).getLong(0) == 4L)
    // unknown table names fail loud, like the reference's hint errors
    intercept[IllegalArgumentException](
      Ddl.query(s, "SELECT * FROM no_such_t /*+ OPTIONS('a' = 'b') */"))
  }
}
