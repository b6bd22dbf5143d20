package graft.sqlx

import graft.SparkSuite
import org.apache.spark.sql.Row

/** Hive-dialect residual DDL (reference SqlAddReplaceColumns /
 * SqlChangeColumn / SqlAddJar / SqlRemoveJar / SqlUseModules — parsed
 * by the reference, rejected by its generic in-memory catalog; this
 * catalog executes them): schema-evolution reads across file
 * generations, ordering, rename chains, loud-failure contracts, the
 * jar registry, and module enable/disable. */
class ColumnDdlSpec extends SparkSuite {

  private var n = 0
  private def freshTable(): String = {
    n += 1
    val out = java.nio.file.Files.createTempDirectory(s"graft_cddl$n").toString
    val name = s"cddl${n}_t"
    Ddl.execute(spark,
      s"""CREATE TABLE $name (k BIGINT, v BIGINT, s STRING)
          WITH ('connector' = 'filesystem', 'path' = '$out',
                'format' = 'parquet')""")
    Ddl.execute(spark,
      s"INSERT INTO $name SELECT 1 AS k, 10 AS v, 'a' AS s")
    name
  }

  private def describeCols(name: String): Seq[(String, String)] =
    Ddl.execute(spark, s"DESCRIBE $name").collect().toSeq
      .map(r => (r.getString(0), r.getString(1)))

  test("ADD COLUMNS: typed NULL on old files, real values on new files, comments parsed") {
    val t = freshTable()
    Ddl.execute(spark,
      s"ALTER TABLE $t ADD COLUMNS (w BIGINT COMMENT 'added later', tag STRING)")
    assert(spark.sql(s"SELECT k, w, tag FROM $t").collect().toSeq ==
      Seq(Row(1L, null, null)))
    Ddl.execute(spark,
      s"INSERT INTO $t SELECT 2 AS k, 20 AS v, 'b' AS s, 200 AS w, 'x' AS tag")
    assert(spark.sql(s"SELECT k, w, tag FROM $t ORDER BY k").collect().toSeq ==
      Seq(Row(1L, null, null), Row(2L, 200L, "x")))
    // duplicate add is loud
    intercept[IllegalArgumentException](
      Ddl.execute(spark, s"ALTER TABLE $t ADD COLUMNS (v BIGINT)"))
  }

  test("CHANGE COLUMN: rename reads old files, retype casts, FIRST/AFTER reorder DESCRIBE") {
    val t = freshTable()
    // rename s -> label: pre-rename file still feeds it
    Ddl.execute(spark, s"ALTER TABLE $t CHANGE COLUMN s label STRING")
    assert(spark.sql(s"SELECT label FROM $t").collect().toSeq == Seq(Row("a")))
    // post-rename inserts write the NEW name; both generations coalesce
    Ddl.execute(spark,
      s"INSERT INTO $t SELECT 2 AS k, 20 AS v, 'b' AS label")
    assert(spark.sql(s"SELECT k, label FROM $t ORDER BY k").collect().toSeq ==
      Seq(Row(1L, "a"), Row(2L, "b")))
    // rename chain label -> s2 still aliases the original storage name
    Ddl.execute(spark, s"ALTER TABLE $t CHANGE label s2 STRING FIRST")
    assert(spark.sql(s"SELECT k, s2 FROM $t ORDER BY k").collect().toSeq ==
      Seq(Row(1L, "a"), Row(2L, "b")))
    assert(describeCols(t).head._1 == "s2") // FIRST repositioned it
    // retype v BIGINT -> STRING casts both file generations
    Ddl.execute(spark, s"ALTER TABLE $t CHANGE v v STRING AFTER s2")
    assert(describeCols(t).map(_._1) == Seq("s2", "v", "k"))
    assert(spark.sql(s"SELECT v FROM $t ORDER BY k").collect().toSeq ==
      Seq(Row("10"), Row("20")))
    // contracts
    intercept[IllegalArgumentException](
      Ddl.execute(spark, s"ALTER TABLE $t CHANGE missing m2 STRING"))
    intercept[IllegalArgumentException](
      Ddl.execute(spark, s"ALTER TABLE $t CHANGE k v BIGINT")) // name collision
    intercept[IllegalArgumentException](
      Ddl.execute(spark, s"ALTER TABLE $t CHANGE k k BIGINT AFTER missing"))
  }

  test("REPLACE COLUMNS: drops, keeps pk/partition guards, survives rename") {
    val t = freshTable()
    Ddl.execute(spark, s"ALTER TABLE $t CHANGE s label STRING")
    Ddl.execute(spark,
      s"ALTER TABLE $t REPLACE COLUMNS (k BIGINT, label STRING)")
    assert(describeCols(t).map(_._1) == Seq("k", "label"))
    // v is gone; the renamed column still reads pre-rename storage
    assert(spark.sql(s"SELECT k, label FROM $t").collect().toSeq ==
      Seq(Row(1L, "a")))
    intercept[org.apache.spark.sql.AnalysisException](
      spark.sql(s"SELECT v FROM $t").collect())
  }

  test("CHANGE retype + INSERT: mixed-generation files stay readable (storage generations)") {
    val t = freshTable() // holds one row: k=1, v=10 BIGINT, s='a'
    Ddl.execute(spark, s"ALTER TABLE $t CHANGE v v STRING")
    // the new generation's value is NOT castable to BIGINT — proves
    // the post-retype file really stores a string, not a re-cast long
    Ddl.execute(spark, s"INSERT INTO $t SELECT 2 AS k, 'zz' AS v, 'b' AS s")
    assert(spark.sql(s"SELECT k, v FROM $t ORDER BY k").collect().toSeq ==
      Seq(Row(1L, "10"), Row(2L, "zz")))
    // a second retype back to BIGINT: the uncastable 'zz' reads NULL,
    // the original long and fresh inserts read through
    Ddl.execute(spark, s"ALTER TABLE $t CHANGE v v BIGINT")
    Ddl.execute(spark, s"INSERT INTO $t SELECT 3 AS k, 30 AS v, 'c' AS s")
    assert(spark.sql(s"SELECT k, v FROM $t ORDER BY k").collect().toSeq ==
      Seq(Row(1L, 10L), Row(2L, null), Row(3L, 30L)))
    // retype then rename: the generation chain follows the new name.
    // Reads are per-file value-preserving: row 2's file stores 'zz'
    // (unrepresentable while the column was BIGINT), so retyping back
    // to STRING surfaces the stored value again
    Ddl.execute(spark, s"ALTER TABLE $t CHANGE v w STRING")
    assert(spark.sql(s"SELECT k, w FROM $t ORDER BY k").collect().toSeq ==
      Seq(Row(1L, "10"), Row(2L, "zz"), Row(3L, "30")))
  }

  test("REPLACE COLUMNS retype keeps mixed generations readable") {
    val t = freshTable()
    Ddl.execute(spark, s"ALTER TABLE $t REPLACE COLUMNS (k BIGINT, v STRING)")
    Ddl.execute(spark, s"INSERT INTO $t SELECT 2 AS k, 'yy' AS v")
    assert(spark.sql(s"SELECT k, v FROM $t ORDER BY k").collect().toSeq ==
      Seq(Row(1L, "10"), Row(2L, "yy")))
  }

  test("prior storage names are reserved: ADD/CHANGE/REPLACE cannot resurrect them") {
    val t = freshTable()
    Ddl.execute(spark, s"ALTER TABLE $t CHANGE s label STRING")
    // the advisor scenario: ADD COLUMNS (s …) would read the OLD
    // column's data out of pre-rename files — must be rejected
    intercept[IllegalArgumentException](
      Ddl.execute(spark, s"ALTER TABLE $t ADD COLUMNS (s BIGINT)"))
    // CHANGE to another column's prior storage name — rejected
    intercept[IllegalArgumentException](
      Ddl.execute(spark, s"ALTER TABLE $t CHANGE v s BIGINT"))
    // REPLACE introducing a prior storage name — rejected
    intercept[IllegalArgumentException](Ddl.execute(spark,
      s"ALTER TABLE $t REPLACE COLUMNS (k BIGINT, label STRING, s BIGINT)"))
    // a DROPPED column's storage name stays retired after REPLACE
    Ddl.execute(spark, s"ALTER TABLE $t REPLACE COLUMNS (k BIGINT, label STRING)")
    intercept[IllegalArgumentException](
      Ddl.execute(spark, s"ALTER TABLE $t ADD COLUMNS (v BIGINT)"))
    // …but a column may reclaim a name from its OWN history
    // (rename-back is the same logical column in every file)
    Ddl.execute(spark, s"ALTER TABLE $t CHANGE label s STRING")
    assert(spark.sql(s"SELECT s FROM $t").collect().toSeq == Seq(Row("a")))
  }

  test("column DDL refuses non-parquet and partition-column targets") {
    val out = java.nio.file.Files.createTempDirectory("graft_cddl_csv").toString
    Ddl.execute(spark,
      s"""CREATE TABLE cddl_csv (k BIGINT, s STRING)
          WITH ('connector' = 'filesystem', 'path' = '$out', 'format' = 'csv')""")
    intercept[IllegalArgumentException](
      Ddl.execute(spark, "ALTER TABLE cddl_csv ADD COLUMNS (w BIGINT)"))

    val out2 = java.nio.file.Files.createTempDirectory("graft_cddl_part").toString
    Ddl.execute(spark,
      s"""CREATE TABLE cddl_part (k BIGINT, part STRING) PARTITIONED BY (part)
          WITH ('connector' = 'filesystem', 'path' = '$out2', 'format' = 'parquet')""")
    intercept[IllegalArgumentException](
      Ddl.execute(spark, "ALTER TABLE cddl_part CHANGE part part2 STRING"))
    intercept[IllegalArgumentException](Ddl.execute(spark,
      "ALTER TABLE cddl_part REPLACE COLUMNS (k BIGINT)")) // drops partition col
  }

  test("ADD/REMOVE/SHOW JARS: registry order, real file check, contracts") {
    val jar = java.nio.file.Files.createTempFile("graft_fake", ".jar")
    val jar2 = java.nio.file.Files.createTempFile("graft_fake2", ".jar")
    val show = () => Ddl.execute(spark, "SHOW JARS").collect().map(_.getString(0)).toSeq
    val before = show()
    Ddl.execute(spark, s"ADD JAR '$jar'")
    Ddl.execute(spark, s"ADD JAR '$jar2'")
    assert(show() == before ++ Seq(jar.toString, jar2.toString))
    intercept[IllegalArgumentException](Ddl.execute(spark, s"ADD JAR '$jar'"))
    intercept[IllegalArgumentException](
      Ddl.execute(spark, "ADD JAR '/nonexistent/x.jar'"))
    Ddl.execute(spark, s"REMOVE JAR '$jar'")
    assert(show() == before :+ jar2.toString)
    intercept[IllegalArgumentException](Ddl.execute(spark, s"REMOVE JAR '$jar'"))
    Ddl.execute(spark, s"REMOVE JAR '$jar2'")
  }

  test("randomized ADD/CHANGE/REPLACE/INSERT sequence tracks a row model") {
    val rnd = new scala.util.Random(20260816L)
    // model: column name -> (declared type tag, per-row values in
    // insertion order). Rows are keyed by insertion index so every
    // read can be reconstructed column-wise.
    val out = java.nio.file.Files.createTempDirectory("graft_cfuzz").toString
    val t = "cfuzz_t"
    Ddl.execute(spark,
      s"""CREATE TABLE $t (k BIGINT)
          WITH ('connector' = 'filesystem', 'path' = '$out',
                'format' = 'parquet')""")
    // live schema model: ordered column names; all typed BIGINT so
    // values stay comparable. cols(0) is always k (never dropped).
    var cols = Vector("k")
    var colSeq = 0
    var rowSeq = 0L
    // expected: per row key, the map colName -> value it was written
    // with (columns added later, or renamed away, read NULL)
    val written = scala.collection.mutable.Map.empty[Long, Map[String, Long]]
    // renames applied AFTER a row was written re-point reads: track
    // current-name -> the name under which each row's file stored it
    def insert(): Unit = {
      rowSeq += 1
      val vals = cols.zipWithIndex.map { case (c, i) =>
        (c, rowSeq * 100 + i) }
      Ddl.execute(spark, s"INSERT INTO $t SELECT " +
        vals.map { case (c, v) => s"CAST($v AS BIGINT) AS $c" }.mkString(", "))
      written(rowSeq) = vals.toMap
    }
    insert()
    for (step <- 0 until 25) {
      rnd.nextInt(4) match {
        case 0 => insert()
        case 1 => // ADD COLUMNS c_n
          colSeq += 1
          Ddl.execute(spark, s"ALTER TABLE $t ADD COLUMNS (c$colSeq BIGINT)")
          cols :+= s"c$colSeq"
        case 2 if cols.size > 1 => // CHANGE rename a non-k column
          val i = 1 + rnd.nextInt(cols.size - 1)
          colSeq += 1
          val (from, to) = (cols(i), s"r$colSeq")
          Ddl.execute(spark, s"ALTER TABLE $t CHANGE $from $to BIGINT")
          // rows written under ANY prior name keep flowing into `to`
          written.keys.foreach { rk =>
            written(rk).get(from).foreach { v =>
              written(rk) = written(rk) - from + (to -> v) }
          }
          cols = cols.updated(i, to)
        case _ if cols.size > 2 => // REPLACE: drop the last column
          val dropped = cols.last
          val keep = cols.init
          Ddl.execute(spark, s"ALTER TABLE $t REPLACE COLUMNS (" +
            keep.map(c => s"$c BIGINT").mkString(", ") + ")")
          written.keys.foreach(rk => written(rk) = written(rk) - dropped)
          cols = keep
        case _ => insert()
      }
      if (step % 6 == 5) {
        val got = spark.sql(s"SELECT ${cols.mkString(", ")} FROM $t")
          .collect().map { r =>
            val k = r.getLong(0)
            k -> cols.zipWithIndex.collect {
              case (c, i) if !r.isNullAt(i) => c -> r.getLong(i) }.toMap
          }.toMap
        val exp = written.map { case (rk, m) =>
          // the row's k value is rk*100+0 by construction; reads of
          // columns the row never carried are NULL (absent from map)
          m("k") -> m.filter { case (c, _) => cols.contains(c) }
        }.toMap
        assert(got == exp, s"step $step:\n got $got\n exp $exp")
      }
    }
    Ddl.execute(spark, s"DROP TABLE $t")
  }

  test("USE MODULES: validates order against loaded modules; core stays resolvable") {
    // session-scoped module state — use a clone so other suites keep core
    val ss = spark.newSession()
    graft.functions.GraftFunctions.register(ss)
    assert(ss.sql("SELECT SPLIT_INDEX('a,b,c', ',', 1)").head().getString(0) == "b")
    Ddl.execute(ss, "USE MODULES core") // the only accepted order
    assert(Ddl.execute(ss, "SHOW MODULES").collect().map(_.getString(0)).toSeq ==
      Seq("core"))
    // functions still resolve after the (validate-and-record) statement
    assert(ss.sql("SELECT SPLIT_INDEX('a,b,c', ',', 2)").head().getString(0) == "c")
    intercept[IllegalArgumentException](Ddl.execute(ss, "USE MODULES hive"))
    intercept[IllegalArgumentException](Ddl.execute(ss, "USE MODULES core, core"))
  }
}
