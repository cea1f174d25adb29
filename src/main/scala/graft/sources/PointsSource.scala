package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** CSV point loading — the reference's two input scenarios
  * (master.py:36-41):
  *
  *   - scenario 1: one `x,y` text file, rows split across mappers by
  *     index range → here a single distributed CSV scan (Spark splits by
  *     byte range; same "each task owns a slice" semantics without the
  *     master hand-assigning indices);
  *   - scenario 2: several files concatenated → a multi-path scan.
  *
  * Tolerates the reference data's ragged whitespace (`"12.3, 45.6 "`).
  * A monotone `pid` is attached for deterministic init ordering.
  */
object PointsSource {
  private val schema = StructType(Seq(
    StructField("x", DoubleType, nullable = false),
    StructField("y", DoubleType, nullable = false)))

  def csv(spark: SparkSession, paths: String*): DataFrame =
    spark.read
      .schema(schema)
      .option("ignoreLeadingWhiteSpace", "true")
      .option("ignoreTrailingWhiteSpace", "true")
      .option("mode", "DROPMALFORMED")
      .csv(paths: _*)
      .withColumn("pid", monotonically_increasing_id())
      .select("pid", "x", "y")

  /** Scenario 1: one file. */
  def scenario1(spark: SparkSession, path: String): DataFrame =
    csv(spark, path)

  /** Scenario 2: many files clustered together. */
  def scenario2(spark: SparkSession, paths: Seq[String]): DataFrame =
    csv(spark, paths: _*)
}
