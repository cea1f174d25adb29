package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

/** Write-side of the engine (SURVEY.md §4): partitioned columnar output
  * with small-file hygiene.
  *
  * The 100-TB failure mode of a naive `df.write.partitionBy(...)` is
  * file-count explosion: every task writes one file per partition value
  * it happens to hold (tasks × values files). Repartitioning by the
  * partition columns first routes each value to one task — one file per
  * value per write (times `maxRecordsPerFile` splits for oversized
  * values, which caps file size instead of memory).
  */
object Sinks {
  /** Partitioned parquet write: one file per partition value unless a
    * value exceeds `maxRecordsPerFile` rows. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
      maxRecordsPerFile: Long = 5000000L): Unit =
    df.repartition(partitionCols.map(col): _*)
      .write
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)
}
