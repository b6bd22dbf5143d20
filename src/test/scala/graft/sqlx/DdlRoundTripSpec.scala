package graft.sqlx

import graft.SparkSuite

/** Round-trip fuzzer for the DDL front-end: random CREATE TABLE
 * statements (random column subsets/order, computed columns, metadata
 * columns, literal- and expression-form watermarks, PARTITIONED BY,
 * random keyword case and whitespace) must (a) parse, (b) execute,
 * and (c) survive SHOW CREATE TABLE → re-parse → re-execute with the
 * SAME structural TableDef and the SAME resolved schema — the
 * reference's catalog contract that SqlShowCreateTable output is
 * itself valid DDL for the identical table
 * (flink-table/flink-sql-parser parserImpls.ftl SqlShowCreateTable).
 * This loop found the expr-watermark printer bug fixed in
 * Ddl.wmOffsetSql. */
class DdlRoundTripSpec extends SparkSuite {

  // physical column pool = the real events.parquet schema (execution
  // reads the actual file, so declared columns must exist there)
  private val colPool = Vector(
    "event_id" -> "BIGINT", "ts" -> "TIMESTAMP", "user_id" -> "BIGINT",
    "event_type" -> "STRING", "value" -> "DOUBLE", "props" -> "STRING")

  private def randCase(s: String, rnd: scala.util.Random): String =
    if (rnd.nextBoolean()) s else if (rnd.nextBoolean()) s.toLowerCase else s.toUpperCase

  test("random DDL → execute → SHOW CREATE TABLE → re-execute is a fixed point") {
    val seed = 20260815L
    val rnd = new scala.util.Random(seed)
    val s = spark.newSession()
    val dir = "/root/testdata/sf0.001"
    for (case_ <- 0 until 40) {
      val name = s"rt_t$case_"
      // at least event_id + ts so watermark/computed generators have targets
      val extra = rnd.shuffle(colPool.drop(2)).take(rnd.nextInt(4))
      val physical = rnd.shuffle(colPool.take(2) ++ extra)
      val computed = (0 until rnd.nextInt(3)).map {
        case 0 => "c_day AS date_trunc('DAY', ts)"
        case _ => "c_key2 AS event_id * 2 + 1"
      }.distinct
      val metadata =
        if (rnd.nextBoolean()) Seq("fname STRING METADATA FROM 'file_name' VIRTUAL") else Nil
      val wm = rnd.nextInt(3) match {
        case 0 => Nil
        case 1 => Seq(s"WATERMARK FOR ts AS ts - INTERVAL '${1 + rnd.nextInt(59)}' SECOND")
        case 2 => Seq("WATERMARK FOR ts AS ts - (INTERVAL '5' SECOND + INTERVAL '2' SECOND)")
      }
      val partBy =
        if (rnd.nextInt(4) == 0) s" PARTITIONED BY (${physical(rnd.nextInt(physical.size))._1})"
        else ""
      val pk = rnd.nextInt(3) match {
        case 0 => Nil
        case 1 => Seq(s"PRIMARY KEY (${physical(rnd.nextInt(physical.size))._1}) NOT ENFORCED")
        case 2 =>
          val cols = rnd.shuffle(physical).take(1 + rnd.nextInt(2)).map(_._1)
          Seq(s"CONSTRAINT pk_$case_ ${randCase("PRIMARY KEY", rnd)} (${cols.mkString(", ")}) NOT ENFORCED")
      }
      val ws = () => if (rnd.nextBoolean()) " " else "\n  "
      val body = (physical.map { case (n, t) => s"$n ${randCase(t, rnd)}" } ++
        metadata ++ computed ++ pk ++ wm).mkString("," + ws())
      val ddl =
        s"""${randCase("CREATE TABLE", rnd)} $name (${ws()}$body${ws()})$partBy
           |WITH ('connector' = 'filesystem',${ws()}'path' = '$dir/events.parquet',
           |      'format' = 'parquet')""".stripMargin

      val def1 = Ddl.parse(ddl)
      Ddl.execute(s, ddl)
      val schema1 = s.table(name).schema
      val shown = Ddl.execute(s, s"SHOW CREATE TABLE $name")
        .collect().head.getString(1)
      val def2 = Ddl.parse(shown)
      // structural identity up to declared-type case (the printer
      // emits the declared text verbatim, so only our random case
      // mutation differs)
      assert(def2.name == def1.name, s"case $case_ (seed $seed): name drifted\n$shown")
      assert(def2.physical.map(c => (c.name, c.typ.toUpperCase)) ==
        def1.physical.map(c => (c.name, c.typ.toUpperCase)),
        s"case $case_ (seed $seed): physical columns drifted\nDDL:\n$ddl\nSHOWN:\n$shown")
      assert(def2.computed == def1.computed,
        s"case $case_ (seed $seed): computed columns drifted\nSHOWN:\n$shown")
      assert(def2.metadata == def1.metadata,
        s"case $case_ (seed $seed): metadata columns drifted\nSHOWN:\n$shown")
      assert(def2.watermark == def1.watermark,
        s"case $case_ (seed $seed): watermark drifted\nDDL:\n$ddl\nSHOWN:\n$shown")
      assert(def2.options == def1.options,
        s"case $case_ (seed $seed): options drifted\nSHOWN:\n$shown")
      assert(def2.partitionedBy == def1.partitionedBy,
        s"case $case_ (seed $seed): partition keys drifted\nSHOWN:\n$shown")
      assert(def2.primaryKey == def1.primaryKey,
        s"case $case_ (seed $seed): primary key drifted\nDDL:\n$ddl\nSHOWN:\n$shown")
      // the reconstructed DDL must itself execute to the same schema
      Ddl.execute(s, s"DROP TABLE $name")
      Ddl.execute(s, shown)
      val schema2 = s.table(name).schema
      assert(schema2 == schema1,
        s"case $case_ (seed $seed): re-executed SHOW CREATE TABLE output " +
        s"resolved a different schema\nfirst: $schema1\nsecond: $schema2")
      Ddl.execute(s, s"DROP TABLE $name")
    }
  }
}
