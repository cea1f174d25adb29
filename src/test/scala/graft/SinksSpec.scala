package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.sources.Sinks

/** Sinks.writePartitioned: layout, round-trip, partition pruning. */
class SinksSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("one file per partition value, round-trip, pruned scan") {
    val s = spark
    import s.implicits._
    val out = Files.createTempDirectory("graft_sink").toString
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    Sinks.writePartitioned(docs, out, Seq("lang"))
    // one parquet file per lang directory (repartition avoided the
    // tasks × values small-file explosion)
    val langDirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("lang="))
    assert(langDirs.length == 5)
    langDirs.foreach { d =>
      assert(d.listFiles().count(_.getName.endsWith(".parquet")) == 1, d.getName)
    }
    // round-trip
    val back = spark.read.parquet(out)
    assert(back.count() == docs.count())
    // partition pruning reaches the scan
    val pruned = back.filter($"lang" === "de")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() ==
      docs.filter($"lang" === "de").count())
    assert(scan.contains("PartitionFilters") &&
      scan.contains("lang"), "expected partition filter in scan")
  }

  test("JSONL: gzip'd shard export, schema-on-read round-trip, garbage dropped") {
    val s = spark
    import s.implicits._
    val out = Files.createTempDirectory("graft_jsonl").toString + "/docs"
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    Sinks.writeJsonl(docs, out, numFiles = 2)
    val shards = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".json.gz"))
    assert(shards.length == 2, "coalesced to the requested shard count")
    val back = Sinks.readJsonl(spark, out, docs.schema)
    assert(back.count() == docs.count())
    assert(back.select($"doc_id", $"text").except(
      docs.select($"doc_id", $"text")).isEmpty)
    // malformed lines are skipped, valid lines survive
    val mixed = Files.createTempDirectory("graft_jsonl2").resolve("m.json")
    Files.write(mixed, java.util.Arrays.asList(
      """{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}""",
      """not json at all""",
      """{"doc_id": 2, "text": "also ok", "lang": "en", "source": "s", "n_chars": 7}"""))
    val read = Sinks.readJsonl(spark, mixed.toString, docs.schema)
    assert(read.count() == 2)
  }

  test("ORC: shard export, footer-schema round-trip, filter pushed to scan") {
    val s = spark
    import s.implicits._
    val out = Files.createTempDirectory("graft_orc").toString + "/docs"
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    Sinks.writeOrc(docs, out, numFiles = 2, bloomCols = Seq("lang"))
    val shards = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".orc"))
    assert(shards.length == 2, "repartitioned to the requested shard count")
    val back = Sinks.readOrc(spark, out)
    assert(back.count() == docs.count())
    assert(back.select($"doc_id", $"text").except(
      docs.select($"doc_id", $"text")).isEmpty)
    // predicate pushdown + column pruning reach the ORC scan
    val q = back.filter($"lang" === "de").select($"doc_id")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(lang), EqualTo(lang,de)]"),
      s"filter must push to the ORC scan: $scan")
    assert(scan.contains("ReadSchema: struct<doc_id:bigint,lang:string>"),
      s"scan must prune to the two referenced columns: $scan")
    assert(q.count() == docs.filter($"lang" === "de").count())
  }

  test("CSV: quoted round-trip incl. embedded delimiters/newlines, garbage dropped") {
    val s = spark
    import s.implicits._
    val out = Files.createTempDirectory("graft_csv").toString + "/docs"
    // texts that stress the RFC-4180 contract: commas, quotes, newlines
    val docs = Seq(
      (1L, "plain text", "en"),
      (2L, "comma, inside", "en"),
      (3L, "a \"quoted\" span", "en"),
      (4L, "line one\nline two", "en"))
      .toDF("doc_id", "text", "lang")
    Sinks.writeCsv(docs, out, numFiles = 2)
    assert(new java.io.File(out).listFiles()
      .count(_.getName.endsWith(".csv.gz")) == 2)
    val back = Sinks.readCsv(spark, out, docs.schema)
    assert(back.count() == 4)
    assert(back.except(docs).isEmpty && docs.except(back).isEmpty,
      "every special character must round-trip bit-identically")
    // malformed rows drop (wrong arity), valid rows survive
    val mixed = Files.createTempDirectory("graft_csv2").resolve("m.csv")
    Files.write(mixed, java.util.Arrays.asList(
      "doc_id,text,lang", "1,ok,en", "not,a,valid,row,at,all", "2,fine,en"))
    assert(Sinks.readCsv(spark, mixed.toString, docs.schema).count() == 2)
  }

  test("range-clustered layout: disjoint per-file key ranges, round-trip") {
    val s = spark
    import s.implicits._
    val out = Files.createTempDirectory("graft_range").toString
    val li = Tables(spark, "/root/testdata/sf0.001", "lineitem")
      .select($"l_orderkey", $"l_extendedprice", $"l_shipdate")
    Sinks.writeRangePartitioned(li, out, 8, Seq("l_shipdate"))
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString).sorted
    assert(files.length >= 2, "range write should produce multiple files")
    // each file's key interval must not overlap any other — the footer
    // min/max property that lets a range predicate skip whole files
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(org.apache.spark.sql.functions.min($"l_shipdate").cast("string"),
          org.apache.spark.sql.functions.max($"l_shipdate").cast("string"))
        .head()
      (r.getString(0), r.getString(1)) // ISO form orders lexicographically
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, aHi), (bLo, _)) =>
        assert(aHi <= bLo, s"file ranges overlap: $aHi > $bLo")
      case _ =>
    }
    // round-trip
    assert(spark.read.parquet(out).count() == li.count())
  }

  test("idempotent batch sink: re-delivered ids no-op, torn writes recover") {
    val s = spark
    import s.implicits._
    val out = Files.createTempDirectory("graft_eos").toString
    val sink = Sinks.idempotentBatchSink(out)
    sink(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), 0L)
    // crash-restart re-delivers batch 0 with (what must be) the same
    // data; a sink that rewrote would at best churn, at worst double
    // under append semantics — ours must not touch the committed dir
    sink(Seq((9L, "POISON")).toDF("id", "v"), 0L)
    val b0 = spark.read.parquet(s"$out/batch_id=0")
    assert(b0.count() == 2 && b0.filter($"v" === "POISON").isEmpty)
    // a new id writes normally; readers see batch_id partitions
    sink(Seq((3L, "c")).toDF("id", "v"), 1L)
    val all = spark.read.parquet(out)
    assert(all.count() == 3)
    assert(all.select("batch_id").distinct().count() == 2)
    // torn write: files present but no _SUCCESS marker → re-delivery
    // must overwrite (the crash happened mid-write, before commit)
    val torn = new java.io.File(s"$out/batch_id=2")
    assert(torn.mkdirs())
    Files.write(torn.toPath.resolve("part-junk.parquet"), Array[Byte](1, 2))
    sink(Seq((4L, "d")).toDF("id", "v"), 2L)
    val b2 = spark.read.parquet(s"$out/batch_id=2")
    assert(b2.count() == 1 && b2.head().getString(1) == "d")
  }

  test("compaction: many small files become the size-targeted few, rows intact") {
    val s = spark
    import s.implicits._
    val in = Files.createTempDirectory("graft_small").toString
    val out = Files.createTempDirectory("graft_compact").toString
    val df = (1 to 10000).map(i => (i.toLong, s"row_$i")).toDF("id", "v")
    df.repartition(50).write.mode("overwrite").parquet(in)
    val smallFiles = new java.io.File(in).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(smallFiles.length == 50)
    val totalBytes = smallFiles.map(_.length).sum
    val target = totalBytes / 4 // force ~4 output files
    val n = Sinks.compactTo(spark, in, out, target)
    val outFiles = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(n >= 4 && n <= 6, s"expected ~4-5 target files, got $n")
    assert(outFiles.length == n)
    val got = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == df.collect().map(r => (r.getLong(0), r.getString(1))).toSet)
  }

  test("schema evolution: old shards null-fill the added column") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft_evolve").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.parquet(s"$dir/shard=0")
    Seq((3L, "c", 0.5), (4L, "d", 0.9)).toDF("id", "v", "quality")
      .write.parquet(s"$dir/shard=1")
    val merged = Sinks.readParquetEvolved(spark, dir)
    assert(merged.columns.toSet == Set("id", "v", "quality", "shard"))
    val rows = merged.select($"id", $"quality").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(rows(1L).isEmpty && rows(2L).isEmpty, "old shard rows null-fill")
    assert(rows(3L).contains(0.5) && rows(4L).contains(0.9))
    // the settled-schema overload reads the same rows without the
    // footer-reconciliation pass
    val settled = Sinks.readParquetEvolved(spark, dir,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("quality",
          org.apache.spark.sql.types.DoubleType))))
    assert(settled.count() == 4)
  }

  test("z-order layout: second-dimension predicates prune files, linear doesn't") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.{min => fmin, max => fmax}
    // 64×64 grid of (x, y) points — every x stripe contains all of y
    val grid = (for (x <- 0 until 64; y <- 0 until 64) yield (x, y))
      .toDF("x", "y")
    val zOut = Files.createTempDirectory("graft_z").toString
    val linOut = Files.createTempDirectory("graft_lin").toString
    Sinks.writeZOrdered(grid, zOut, 16, "x", "y")
    Sinks.writeRangePartitioned(grid, linOut, 16, Seq("x"))
    def fileRanges(dir: String): Array[(Int, Int)] =
      new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map { f =>
          val r = spark.read.parquet(f.toString)
            .agg(fmin($"y"), fmax($"y")).head()
          (r.getInt(0), r.getInt(1))
        }
    // predicate: y in [0, 8) — a file prunes iff its y-interval misses it
    def prunedFrac(ranges: Array[(Int, Int)]): Double =
      ranges.count { case (lo, hi) => hi < 0 || lo >= 8 }.toDouble / ranges.length
    val zRanges = fileRanges(zOut)
    val linRanges = fileRanges(linOut)
    assert(zRanges.length >= 8 && linRanges.length >= 8)
    assert(prunedFrac(linRanges) == 0.0,
      "every x-sorted file spans all of y — nothing prunes")
    assert(prunedFrac(zRanges) >= 0.5,
      s"z-order should prune most files for a narrow y predicate; " +
        s"got ${prunedFrac(zRanges)} over ${zRanges.mkString(",")}")
    // round-trip: clustering reorders, never drops
    assert(spark.read.parquet(zOut).count() == grid.count())
    val got = spark.read.parquet(zOut).collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(got == grid.collect().map(r => (r.getInt(0), r.getInt(1))).toSet)
  }
}
