package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
