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

  /** JSONL (one JSON object per line) export — the interchange format
    * document pipelines hand to tokenizer / training jobs. gzip'd by
    * default (JSONL is ~5× parquet on disk otherwise); `numFiles`
    * repartitions to exactly that many hand-off-sized shards (a
    * round-robin shuffle — coalesce could only shrink, and an export's
    * shard count is a contract, not a hint). */
  def writeJsonl(df: DataFrame, path: String, numFiles: Int = 0,
      compress: Boolean = true): Unit = {
    val out = if (numFiles > 0) df.repartition(numFiles) else df
    val w = out.write.mode(SaveMode.Overwrite)
    (if (compress) w.option("compression", "gzip") else w).json(path)
  }

  /** JSONL read with a REQUIRED schema: schema-on-read without the
    * driver-side inference scan a schemaless `spark.read.json` would
    * run over the whole corpus (at 100 TB, inference is a full extra
    * pass). Malformed lines land in `_corrupt_record`-free DROPMALFORMED
    * mode — ingest skips garbage instead of failing the job. */
  def readJsonl(spark: org.apache.spark.sql.SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).option("mode", "DROPMALFORMED").json(path)
}
