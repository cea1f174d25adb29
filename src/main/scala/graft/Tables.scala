package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table access for the driver-generated TPC-H-ish testdata.
  *
  * The reference engine's only source is CSV text files of points
  * (master.py:36-41); here the primary substrate is columnar parquet so
  * Catalyst can push filters/projections into the scan — see
  * [[graft.sources.PointsSource]] for the CSV scenario-1/2 equivalents.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // The driver's events table stores TIMESTAMP(NANOS), which Spark's
    // parquet reader rejects by default; read it as raw nanos and narrow
    // to µs (integral DIV — a double division would lose precision at
    // 1.7e18). Conditional on the surfaced dtype so a re-written events
    // table that already stores µs timestamps (the ScaleUp-derived sf1
    // set) reads through unchanged.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" &&
        df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else df
  }
}
