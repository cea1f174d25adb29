package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

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

  /** CSV export with explicit header/quote/escape contract — the
    * lowest-common-denominator hand-off format (spreadsheet audits,
    * legacy ingest). Same shard-count contract as [[writeJsonl]]. */
  def writeCsv(df: DataFrame, path: String, numFiles: Int = 0,
      compress: Boolean = true): Unit = {
    val out = if (numFiles > 0) df.repartition(numFiles) else df
    val w = out.write.mode(SaveMode.Overwrite)
      .option("header", "true")
      .option("quote", "\"").option("escape", "\"") // RFC-4180 doubling
    (if (compress) w.option("compression", "gzip") else w).csv(path)
  }

  /** CSV read with a REQUIRED schema — same contract as [[readJsonl]]:
    * no inference pass (at 100 TB, inference is a full extra scan AND
    * can mis-type a column from a lucky sample), explicit RFC-4180
    * quote/escape so embedded delimiters and newlines round-trip
    * (`multiLine` makes quoted newlines legal; the cost — a quoted file
    * can't be split at arbitrary byte offsets — is the documented CSV
    * trade-off, and the reason parquet is the internal format while CSV
    * is only an edge). Malformed lines drop, as in [[readJsonl]]:
    * ingest skips garbage instead of failing the job. */
  def readCsv(spark: org.apache.spark.sql.SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("quote", "\"").option("escape", "\"")
      .option("multiLine", "true")
      .option("mode", "DROPMALFORMED")
      .csv(path)

  /** ORC export — the columnar interchange format where the downstream
    * stack is Hive/Trino-centric. Same shard-count contract as
    * [[writeJsonl]]. ORC files carry per-stripe min/max statistics
    * (plus optional per-column bloom filters via `bloomCols`), so
    * predicate pushdown and column pruning work exactly as with the
    * internal parquet format — SinksSpec asserts the filter reaches
    * the ORC scan as a pushed predicate. */
  def writeOrc(df: DataFrame, path: String, numFiles: Int = 0,
      bloomCols: Seq[String] = Nil): Unit = {
    val out = if (numFiles > 0) df.repartition(numFiles) else df
    val w = out.write.mode(SaveMode.Overwrite)
    (if (bloomCols.nonEmpty)
       w.option("orc.bloom.filter.columns", bloomCols.mkString(","))
     else w).orc(path)
  }

  /** ORC read — self-describing footer schema like parquet, so no
    * inference pass and no required-schema contract ([[readJsonl]] /
    * [[readCsv]] need one only because text formats are schemaless). */
  def readOrc(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Range-clustered parquet layout: `repartitionByRange` routes each
    * sort-key range to one output file and `sortWithinPartitions`
    * orders rows inside it, so every file's parquet footer carries a
    * TIGHT, pairwise-disjoint min/max for the key — a range predicate
    * then prunes whole files/row-groups at scan time instead of
    * reading and filtering them. This is the data-layout half of
    * partition pruning: `partitionBy` handles low-cardinality
    * categorical keys (directory pruning), range clustering handles
    * high-cardinality ordered keys (dates, ids) where one directory
    * per value would be the small-file explosion.
    *
    * The range boundaries come from Spark's reservoir sample of the
    * key column (one extra pass over the input — the price of balanced
    * output files regardless of key skew). SinksSpec asserts the
    * resulting file-level min/max intervals are disjoint, which is the
    * property row-group skipping needs. */
  def writeRangePartitioned(df: DataFrame, path: String, numFiles: Int,
      sortCols: Seq[String]): Unit =
    df.repartitionByRange(numFiles, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write
      .mode(SaveMode.Overwrite)
      .parquet(path)

  /** Exactly-once `foreachBatch` sink: Structured Streaming guarantees
    * a batch id is REPROCESSED after a crash-restart (at-least-once
    * delivery into the sink), so an external sink is exactly-once only
    * if re-delivery of the same id is a no-op. This writer makes the
    * batch directory the idempotence token: each micro-batch lands in
    * `out/batch_id=<id>/`, and a re-delivered id whose directory
    * already COMMITTED (Spark's `_SUCCESS` marker — written after the
    * files, so a torn write from the crash has no marker and is safely
    * overwritten) is skipped. Readers see `batch_id` as a partition
    * column of `out/`. The check is one driver-side metadata probe per
    * batch; nothing about the data path changes — this is the
    * file-sink commit protocol made explicit for sinks Spark doesn't
    * manage (the pattern a JDBC/object-store `foreachBatch` needs,
    * demonstrated on the filesystem where the spec can crash-restart
    * it).
    *
    * Preconditions the exactly-once claim carries (advisor finding,
    * round 4): the `_SUCCESS` marker is only written while
    * `mapreduce.fileoutputcommitter.marksuccessfuljobs` is true (the
    * default) — the sink ASSERTS it rather than silently degrading to
    * rewrite-on-every-redelivery; and the check-then-write is not
    * atomic, so the out path must have a SINGLE writer — which a
    * `foreachBatch` sink has by construction (one streaming query, one
    * driver), but two queries sharing one out path would race. */
  def idempotentBatchSink(out: String): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => {
      val conf = batch.sparkSession.sparkContext.hadoopConfiguration
      require(conf.getBoolean(
          "mapreduce.fileoutputcommitter.marksuccessfuljobs", true),
        "idempotentBatchSink's commit detection needs " +
          "mapreduce.fileoutputcommitter.marksuccessfuljobs=true")
      val dir = new org.apache.hadoop.fs.Path(s"$out/batch_id=$batchId")
      val fs = dir.getFileSystem(conf)
      val committed = fs.exists(
        new org.apache.hadoop.fs.Path(dir, "_SUCCESS"))
      if (!committed)
        batch.write.mode(SaveMode.Overwrite).parquet(dir.toString)
    }

  /** Small-file compaction — the table-maintenance job that keeps a
    * long-lived dataset scannable. Streaming sinks, incremental
    * appends, and over-parallel writers leave thousands of KB-sized
    * files per partition; at 100 TB the scan cost becomes file-open
    * overhead (footer reads, scheduler tasks) instead of IO. Target
    * file count is sized from the FILESYSTEM LISTING (bytes on disk /
    * `targetBytes`) — a metadata-only driver step, no counting pass
    * over the data — then one round-robin repartition rewrites to
    * `outPath` (never in place: Spark reads lazily, so overwriting the
    * input while scanning it is a self-truncation). Returns the file
    * count written. */
  def compactTo(spark: org.apache.spark.sql.SparkSession, inPath: String,
      outPath: String, targetBytes: Long = 128L * 1024 * 1024): Int = {
    val p = new org.apache.hadoop.fs.Path(inPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.listStatus(p)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
    val n = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inPath)
      .repartition(n)
      .write.mode(SaveMode.Overwrite).parquet(outPath)
    n
  }

  /** Schema-evolution read: union shards written at different schema
    * versions (a column added mid-corpus) into one frame, null-filling
    * the column where an old shard predates it. `mergeSchema` makes
    * Spark reconcile EVERY file's footer instead of sampling one — the
    * price is a distributed footer-read job at planning time, which is
    * why a stable table should persist its merged schema and use the
    * explicit-schema overload (zero planning passes, the
    * [[readJsonl]]/[[readCsv]] stance) once evolution settles. */
  def readParquetEvolved(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** The settled-schema overload: no footer reconciliation pass; files
    * missing a column yield nulls for it, extra columns are pruned. */
  def readParquetEvolved(spark: org.apache.spark.sql.SparkSession,
      path: String, schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).parquet(path)

  /** 16-bit Morton spread: inserts a zero bit between every bit of the
    * low 16 bits, via the classic magic-mask doubling ladder — four
    * shift/or/and steps, all codegen'd builtins (no UDF). */
  private def spread16(c: Column): Column = {
    val s1 = c.bitwiseOR(shiftleft(c, 8)).bitwiseAND(lit(0x00FF00FFL))
    val s2 = s1.bitwiseOR(shiftleft(s1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val s3 = s2.bitwiseOR(shiftleft(s2, 2)).bitwiseAND(lit(0x33333333L))
    s3.bitwiseOR(shiftleft(s3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Z-ORDER (Morton-curve) clustered layout: the multi-dimensional
    * complement of [[writeRangePartitioned]]. A linear sort on key A
    * gives tight per-file min/max for A but every file spans B's full
    * range — a predicate on B alone prunes nothing. Interleaving the
    * bits of both keys' 16-bit min/max-normalized ranks and range-
    * clustering on the interleaved value makes every output file a
    * small rectangle in (A, B) space, so footer-stats pruning works
    * for predicates on EITHER dimension (at ~√ the one-dimensional
    * tightness each — the Z-curve trade). This is the layout a
    * time × tenant or user × day table wants when both columns carry
    * selective predicates; same mechanism Delta/Iceberg expose as
    * OPTIMIZE ZORDER BY, built here from two scans (bounds agg +
    * write) and pure builtin bit arithmetic.
    *
    * Normalization is min/max scaling to [0, 65535] via a broadcast
    * 1-row bounds aggregate (the histogram-bounds pattern — no driver
    * collect, works for any numeric type; `greatest(span, 1)` guards
    * the constant column). SinksSpec asserts the rectangle property:
    * a narrow predicate on the SECOND dimension prunes most z-ordered
    * files by min/max while pruning zero linearly-sorted files. */
  def writeZOrdered(df: DataFrame, path: String, numFiles: Int,
      colA: String, colB: String): Unit = {
    val bounds = df.agg(
      min(col(colA)).as("__alo"), max(col(colA)).as("__ahi"),
      min(col(colB)).as("__blo"), max(col(colB)).as("__bhi"))
    def rank16(c: Column, lo: Column, hi: Column): Column =
      ((c - lo) * 65535.0 / greatest(hi - lo, lit(1.0))).cast("long")
    val z = df.crossJoin(broadcast(bounds))
      .withColumn("__z",
        spread16(rank16(col(colA), col("__alo"), col("__ahi")))
          .bitwiseOR(shiftleft(
            spread16(rank16(col(colB), col("__blo"), col("__bhi"))), 1)))
      .drop("__alo", "__ahi", "__blo", "__bhi")
    z.repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write
      .mode(SaveMode.Overwrite)
      .parquet(path)
  }
}
