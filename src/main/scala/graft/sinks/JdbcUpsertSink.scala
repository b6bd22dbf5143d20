package graft.sinks

import java.sql.DriverManager
import org.apache.spark.sql.{DataFrame, Row}

/**
 * JDBC upsert sink (reference flink-connector-jdbc upsert path:
 * `JdbcUpsertTableSink` / the upsert `JdbcOutputFormat`,
 * flink-connectors/flink-connector-jdbc/src/main/java/org/apache/flink/
 * connector/jdbc/internal/JdbcOutputFormat.java): per-partition batched
 * DELETE+INSERT transactions keyed on the primary key — the
 * dialect-portable form of the reference's "dialect upsert statement,
 * else delete+insert" fallback. Executors write their partitions in
 * parallel (embedded Derby is same-JVM under local mode; a networked
 * warehouse gets the identical per-partition batching), and the write
 * is idempotent under micro-batch replay because a replayed key
 * re-deletes before re-inserting — the 2PC-free exactly-once recipe
 * the reference documents for idempotent upsert sinks.
 */
object JdbcUpsertSink {

  private def connect(url: String) = {
    // executor-side classloaders may not have run the driver's static
    // registration yet
    try Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    catch { case _: ClassNotFoundException => () }
    DriverManager.getConnection(url)
  }

  /** DROP (if present) + CREATE the target table — a fresh sink per run. */
  def resetTable(url: String, table: String, schemaSql: String): Unit = {
    val c = connect(url)
    try {
      val st = c.createStatement()
      try st.executeUpdate(s"DROP TABLE $table")
      catch { case _: java.sql.SQLException => () } // didn't exist yet
      st.executeUpdate(s"CREATE TABLE $table ($schemaSql)")
      st.close()
    } finally c.close()
  }

  /** Upsert every row of `df` (at most one row per key per call) into
   * `table`: batched DELETE of the incoming keys + batched INSERT, one
   * transaction per partition. */
  def upsert(df: DataFrame, url: String, table: String,
             cols: Seq[String], keyCol: String): Unit = {
    val colList = cols.mkString(", ")
    val qs = cols.map(_ => "?").mkString(", ")
    val names = cols.toIndexedSeq
    val keyIdx = names.indexOf(keyCol)
    df.select(cols.map(org.apache.spark.sql.functions.col): _*)
      .foreachPartition { rows: Iterator[Row] =>
        if (rows.hasNext) {
          val c = connect(url)
          try {
            c.setAutoCommit(false)
            val del = c.prepareStatement(s"DELETE FROM $table WHERE $keyCol = ?")
            val ins = c.prepareStatement(
              s"INSERT INTO $table ($colList) VALUES ($qs)")
            rows.foreach { r =>
              del.setObject(1, r.get(keyIdx)); del.addBatch()
              names.indices.foreach(i => ins.setObject(i + 1, r.get(i)))
              ins.addBatch()
            }
            del.executeBatch(); ins.executeBatch()
            c.commit()
            del.close(); ins.close()
          } finally c.close()
        }
      }
  }
}
