package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  // -------------------------------------------------- narrow-scan spread
  //
  // r14 optimization-round machinery. The driver's testdata (and the
  // ScaleUp-derived sf1/sf10 sets) are single-file, SINGLE-ROW-GROUP
  // parquet tables. Parquet cannot split a row group, so every scan —
  // and the whole WholeStageCodegen pipeline fused onto it: tokenize/
  // regex work, dot-product pair streams of broadcast self-joins,
  // partial aggregation — executes as ONE task no matter the core
  // count (measured: 25 stack samples of dedup_semantic at sf1 saw ~1
  // live executor thread; the query ran 78 s where its arithmetic is
  // ~3 s of 32-core work; spreading its pair-stage input cut it to
  // ~16 s). Two spread layers, both CONDITIONAL on the measured scan
  // width so a production table with normal row-group/file parallelism
  // passes through untouched (no extra exchange at 100 TB):
  //
  //   1. [[apply]] spreads a fact table whose file is big enough that a
  //      narrow scan is substantial serial work ([[SpreadMinBytes]]) —
  //      a no-op at the driver's sf0.1 scale (largest file 10.8 MB; a
  //      blanket spread there MEASURED as a 150 -> 217 s suite
  //      regression: 32-task exchanges on KB-per-task data), active at
  //      sf1+ where single-task scans of 113 MB - 1.1 GB gate whole
  //      queries.
  //   2. [[spread]] is the surgical per-operator form for
  //      expression-heavy substrates (embedding pair stages, LM token
  //      pipelines) whose per-byte compute dwarfs the byte count —
  //      applied at measured call sites only.
  //
  // The width probe reads parquet FOOTERS (row-group count), not the
  // scan's split count: Spark happily plans 32 splits over a 1 GB
  // single-row-group file, but only the split containing the row
  // group's midpoint yields rows — split count overstates real
  // parallelism exactly where it matters. Hash-by-key (never
  // round-robin) keeps the row-to-partition map deterministic under
  // retries (SPARK-38388 discipline) and skips round-robin's
  // sort-before-repartition. The partition count is EXPLICIT
  // (REPARTITION_BY_NUM): a bare repartition(keys) is AQE-coalesced
  // back down by BYTES (measured: 1 partition at test scale), but the
  // point here is CPU parallelism, where bytes say nothing about cost;
  // the count still tracks defaultParallelism, so the driver's
  // lower-core scaling run keeps a proportionally smaller width.
  // Results are unchanged by construction for every registry query:
  // deterministic final ORDER BY everywhere, order-free aggregation
  // discipline documented per operator (DECIMAL money sums, integer
  // fixed-point folds) — re-verified against the DuckDB oracle after
  // the change. Conf gate spark.graft.spreadNarrowScans (default on):
  // PlanShapeSpec/TpchExtraSpec assert the AT-SCALE plan regime by
  // turning it off.

  /** Fact/corpus tables eligible for the [[apply]]-level spread and
    * the stable high-cardinality hash key each spreads on. Dimension
    * tables stay unspread: they ride broadcast or key-shuffled join
    * sides where an extra exchange buys nothing. */
  private val SpreadKeys: Map[String, Seq[String]] = Map(
    "lineitem" -> Seq("l_orderkey"),
    "orders" -> Seq("o_orderkey"),
    "events" -> Seq("event_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  /** [[apply]]-level spread threshold: below this file size the
    * per-query exchange + 32-task stage costs more than the serial
    * scan it parallelizes (measured at sf0.1, where EVERY table is
    * under it); above it a serial scan is whole-seconds of work
    * (sf1 lineitem 113 MB, sf10 1.1 GB). */
  val SpreadMinBytes: Long = 48L * 1024 * 1024

  private case class ScanMeta(rowGroups: Int, bytes: Long)

  private val metaCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), ScanMeta]()

  /** Parquet-footer scan metadata (row-group count = the real upper
    * bound on scan parallelism, total file bytes), memoized per
    * (dir, table). Footer reads are driver-side metadata I/O only. */
  private def scanMeta(spark: SparkSession, dir: String, name: String): ScanMeta =
    metaCache.computeIfAbsent((dir, name), _ => {
      try {
        val conf = spark.sparkContext.hadoopConfiguration
        val path = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
        val fs = path.getFileSystem(conf)
        val files = if (fs.getFileStatus(path).isDirectory)
          fs.listStatus(path).filter(f => f.getPath.getName.endsWith(".parquet"))
        else Array(fs.getFileStatus(path))
        var groups = 0
        var bytes = 0L
        files.foreach { f =>
          bytes += f.getLen
          val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(f, conf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try groups += r.getRowGroups.size finally r.close()
        }
        ScanMeta(groups, bytes)
      } catch { case _: Throwable =>
        // unreadable footer: report "wide enough" so no spread fires
        ScanMeta(Int.MaxValue, 0L)
      }
    })

  private def spreadOn(spark: SparkSession): Boolean =
    spark.conf.get("spark.graft.spreadNarrowScans", "true") == "true"

  /** Surgical spread for an expression-heavy frame derived from table
    * `name`: hash-spread onto the full core count when the table's
    * real scan width (parquet row groups) is narrower than the session
    * parallelism. No-op when the layout is already parallel, when the
    * conf gate is off, or when the frame already carries a repartition
    * (composition with the [[apply]]-level spread). */
  def spread(df: DataFrame, dir: String, name: String, keys: Column*): DataFrame = {
    val spark = df.sparkSession
    val cores = spark.sparkContext.defaultParallelism
    val alreadySpread = df.queryExecution.logical.collectFirst {
      case r: org.apache.spark.sql.catalyst.plans.logical.RepartitionByExpression => r
      case r: org.apache.spark.sql.catalyst.plans.logical.Repartition => r
    }.nonEmpty
    if (!spreadOn(spark) || alreadySpread ||
        scanMeta(spark, dir, name).rowGroups >= cores) df
    else df.repartition(cores, keys: _*)
  }

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // The driver's events table stores TIMESTAMP(NANOS), which Spark's
    // parquet reader rejects by default; read it as raw nanos and narrow
    // to µs (integral DIV — a double division would lose precision at
    // 1.7e18). Conditional on the surfaced dtype so a re-written events
    // table that already stores µs timestamps (the ScaleUp-derived sf1
    // set) reads through unchanged.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    val fixed =
      if (name == "events" &&
          df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      else df
    SpreadKeys.get(name) match {
      case Some(keys) if spreadOn(spark) =>
        val meta = scanMeta(spark, dir, name)
        val cores = spark.sparkContext.defaultParallelism
        if (meta.bytes >= SpreadMinBytes && meta.rowGroups < cores)
          fixed.repartition(cores, keys.map(col): _*)
        else fixed
      case _ => fixed
    }
  }
}
