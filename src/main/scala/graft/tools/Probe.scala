package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{SparkEntry, Tables}

/** Local smoke runner: mimics the driver's t1 gate — runs
 * `SparkEntry.entry` and prints its rows, then optionally one named
 * query on a given sf dir. Dev tool only. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Tables.configure(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args match {
      case Array(name, dir) =>
        val df = SparkEntry.queries(name)(spark, dir)
        df.explain("formatted")
        df.show(20, truncate = false)
        println(s"rows=${df.count()}")
      case _ =>
        val df = SparkEntry.entry(spark)
        df.show(20, truncate = false)
        println(s"entry rows=${df.count()}")
    }
    spark.stop()
  }
}
