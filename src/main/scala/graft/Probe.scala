package graft

import org.apache.spark.sql.SparkSession

/** One-off environment probe (ns timestamps, duckdb parity checks). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.printSchema()
    ev.selectExpr("ts", "unix_timestamp(ts) as sec", "cast(ts as long) as lsec").show(5, false)
    spark.stop()
  }
}
