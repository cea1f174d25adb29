package graft

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.kmeans.Centroid
import graft.streaming.{SessionEvent, SessionizeStream, StreamOps, StreamPoint}

/** SURVEY.md §2.A streaming specs: the Structured Streaming paths run
  * against MemoryStreams and are checked against their batch twins (the
  * twins themselves are DuckDB-oracle-checked via the driver contract). */
class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("windowedAgg: streaming run equals batch run on the same events") {
    val s = spark
    import s.implicits._
    implicit val ctx = spark.sqlContext
    val rows = Seq(
      (ts("2026-01-01 01:00:00"), "click", 1.0),
      (ts("2026-01-01 09:30:00"), "click", 2.5),
      (ts("2026-01-01 12:00:00"), "view", 4.0),
      (ts("2026-01-02 00:10:00"), "click", 8.0))
    val mem = MemoryStream[(Timestamp, String, Double)]
    val q = StreamOps.windowedAgg(
        mem.toDF().toDF("ts", "event_type", "value"))
      .writeStream.format("memory").queryName("wagg")
      .outputMode("complete").start()
    mem.addData(rows.take(2))
    q.processAllAvailable()
    mem.addData(rows.drop(2)) // second micro-batch updates day-1, adds day-2
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("wagg")
      .select($"window.start".as("ws"), $"event_type", $"n", $"sum_value")
      .collect().map(_.toSeq).toSet
    val batch = StreamOps.windowedAgg(
        rows.toDF("ts", "event_type", "value"))
      .select($"window.start".as("ws"), $"event_type", $"n", $"sum_value")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(streamed.size == 3) // (day1 click), (day1 view), (day2 click)
  }

  test("streaming sessionize: merge, bridge-fusion, timeout close = batch rule") {
    val s = spark
    import s.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[SessionEvent]
    val q = SessionizeStream.sessionize(
        mem.toDS().withWatermark("ts", "2 hours"))
      .writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    // batch 1 — user 1: two events 10 min apart, OUT OF ORDER in the
    // batch; user 2: one event; user 3: two events 50 min apart (two
    // provisional sessions)
    mem.addData(
      SessionEvent(1L, ts("2026-01-01 10:10:00"), 2),
      SessionEvent(1L, ts("2026-01-01 10:00:00"), 1),
      SessionEvent(2L, ts("2026-01-01 10:00:00"), 3),
      SessionEvent(3L, ts("2026-01-01 10:00:00"), 6),
      SessionEvent(3L, ts("2026-01-01 10:50:00"), 7))
    q.processAllAvailable()
    assert(spark.table("sess").count() == 0, "nothing closed yet")
    // batch 2 — user 1: EXACT-gap event (10:10 + 1800 s) must stay
    // in-session; user 2 extends; user 3: a LATE event that bridges
    // its two provisional sessions (≤ gap from both) must FUSE them
    mem.addData(
      SessionEvent(1L, ts("2026-01-01 10:40:00"), 4),
      SessionEvent(2L, ts("2026-01-01 10:05:00"), 5),
      SessionEvent(3L, ts("2026-01-01 10:25:00"), 8))
    q.processAllAvailable()
    // batch 3 — a far-future event for another user advances the
    // watermark past every session's end + gap: all three close via
    // EVENT-TIME TIMEOUT (no later event of their own needed — the
    // idle-user case a data-driven close never emits)
    mem.addData(SessionEvent(99L, ts("2026-01-01 14:00:00"), 9))
    q.processAllAvailable()
    q.stop()
    val closed = spark.table("sess").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    def sec(t: String): Long = ts(t).getTime / 1000L
    assert(closed == Set(
      (1L, sec("2026-01-01 10:00:00"), sec("2026-01-01 10:40:00"), 3L, 2400L),
      (2L, sec("2026-01-01 10:00:00"), sec("2026-01-01 10:05:00"), 2L, 300L),
      (3L, sec("2026-01-01 10:00:00"), sec("2026-01-01 10:50:00"), 3L, 3000L)),
      s"streamed sessions: $closed")
    // …and that is exactly the batch sessionization of the same events
    val batch = graft.operators.RelationalQueries.withSessionIds(
        Seq((1L, ts("2026-01-01 10:00:00"), 1L), (1L, ts("2026-01-01 10:10:00"), 2L),
          (1L, ts("2026-01-01 10:40:00"), 4L), (2L, ts("2026-01-01 10:00:00"), 3L),
          (2L, ts("2026-01-01 10:05:00"), 5L), (3L, ts("2026-01-01 10:00:00"), 6L),
          (3L, ts("2026-01-01 10:50:00"), 7L), (3L, ts("2026-01-01 10:25:00"), 8L))
          .toDF("user_id", "ts", "event_id"))
      .groupBy($"user_id", $"sess_id")
      .agg(min(unix_timestamp($"ts")).as("a"), max(unix_timestamp($"ts")).as("b"),
        count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(3) - r.getLong(2))).toSet
    assert(closed == batch, s"batch twin disagrees: $batch")
  }

  test("streamingRangeJoin: out-of-order stream pairs = batch range join") {
    val s = spark
    import s.implicits._
    implicit val ctx = spark.sqlContext
    // user 1: click 10:00; errors at 10:30 (in range) and 11:30 (out);
    // user 2: error 10:05 with no prior click; a second click 10:45
    // pairs with the 11:30 error. Errors arrive out of order.
    val clicks = Seq(
      (1L, ts("2026-01-01 10:00:00"), 100L),
      (1L, ts("2026-01-01 10:45:00"), 101L))
    val errors = Seq(
      (1L, ts("2026-01-01 11:30:00"), 201L), // arrives first, joins later click
      (1L, ts("2026-01-01 10:30:00"), 200L),
      (2L, ts("2026-01-01 10:05:00"), 202L))
    val cMem = MemoryStream[(Long, Timestamp, Long)]
    val eMem = MemoryStream[(Long, Timestamp, Long)]
    val q = StreamOps.streamingRangeJoin(
        cMem.toDF().toDF("user_id", "c_ts", "c_id"),
        eMem.toDF().toDF("user_id", "e_ts", "e_id"))
      .writeStream.format("memory").queryName("srj")
      .outputMode("append").start()
    cMem.addData(clicks.take(1))
    eMem.addData(errors.take(1))
    q.processAllAvailable()
    cMem.addData(clicks.drop(1))
    eMem.addData(errors.drop(1))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("srj")
      .select($"c_id", $"e_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == Set((100L, 200L), (101L, 201L)),
      s"streamed pairs: $streamed")
    // exactly the batch inequality join of the same rows
    val batch = clicks.toDF("user_id", "c_ts", "c_id")
      .join(errors.toDF("e_user", "e_ts", "e_id"),
        $"user_id" === $"e_user" && $"e_ts" >= $"c_ts" &&
          $"e_ts" <= $"c_ts" + org.apache.spark.sql.functions.expr("INTERVAL 1 HOUR"))
      .select($"c_id", $"e_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch)
  }

  test("streamingKMeans: running state across micro-batches = cumulative means") {
    val s = spark
    import s.implicits._
    implicit val ctx = spark.sqlContext
    val cs = Seq(Centroid(1, 0.0, 0.0), Centroid(2, 10.0, 10.0))
    val mem = MemoryStream[StreamPoint]
    val q = StreamOps.streamingKMeans(mem.toDS(), cs)
      .writeStream.format("memory").queryName("skm")
      .outputMode(StreamOps.KMeansOutputMode).start()
    mem.addData(StreamPoint(1, 1.0, 1.0), StreamPoint(2, 9.0, 9.0))
    q.processAllAvailable()
    mem.addData(StreamPoint(3, 3.0, 1.0), StreamPoint(4, 11.0, 13.0))
    q.processAllAvailable()
    q.stop()
    // latest update per cluster = mean over ALL its points so far
    val last = spark.table("skm")
      .groupBy($"cid").agg(max_by(struct($"x", $"y", $"n"), $"n").as("s"))
      .select($"cid", $"s.x", $"s.y", $"s.n")
      .collect().map(r => r.getInt(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3))))
      .toMap
    assert(last(1) == ((2.0, 1.0, 2L)))   // (1,1),(3,1) → mean (2,1)
    assert(last(2) == ((10.0, 11.0, 2L))) // (9,9),(11,13) → mean (10,11)
  }

  test("streamingQualityGate: stream scoring equals the batch expression") {
    val s = spark
    import s.implicits._
    implicit val ctx = spark.sqlContext
    val vocab = Seq("alpha", "beta", "gamma")
    // a batch-trained weight artifact (here the sf0.001-learned table —
    // the gate consumes LEARNED weights since round 13)
    val weights = graft.operators.LangModel
      .clfLearnedWeights(spark, "/root/testdata/sf0.001")
    val rows = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha unknown beta"),
      (3L, ""),                       // zero tokens: margin 0, kept=false
      (4L, "totally novel words here"))
    val mem = MemoryStream[(Long, String)]
    val q = StreamOps.streamingQualityGate(
        mem.toDF().toDF("doc_id", "text"), vocab, weights)
      .writeStream.format("memory").queryName("sqgate")
      .outputMode("append").start()
    mem.addData(rows(3), rows(1)) // out of order across batches
    q.processAllAvailable()
    mem.addData(rows(0), rows(2))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sqgate").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))).toMap
    val batch = StreamOps.streamingQualityGate(
        rows.toDF("doc_id", "text"), vocab, weights).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))).toMap
    assert(streamed == batch, s"stream $streamed vs batch $batch")
    assert(batch(3L) == ((0L, 0L, 0L, false)))
    assert(batch(2L)._3 == 1L, "one OOV token in doc 2")
  }

  test("streamingOutlierGate: stream scoring equals batch, unknown label fails closed") {
    val s = spark
    import s.implicits._
    implicit val ctx = spark.sqlContext
    // batch-trained artifact: two labels with hand-sized centroids
    val cents = Seq(
      (0, Seq(1.0, 0.0), 1.0),
      (1, Seq(0.6, 0.8), 1.0))
    val rows = Seq(
      (1L, Seq(2.0f, 0.0f), 0),   // cos 1.0 to label 0 -> keep
      (2L, Seq(0.0f, 3.0f), 0),   // cos 0.0 -> drop
      (3L, Seq(0.6f, 0.8f), 1),   // cos 1.0 to label 1 -> keep
      (4L, Seq(1.0f, 0.0f), 7),   // untrained label: fail CLOSED
      (5L, Seq(0.0f, 0.0f), 0))   // zero-norm vector: NaN guard, CLOSED
    val mem = MemoryStream[(Long, Seq[Float], Int)]
    val q = StreamOps.streamingOutlierGate(
        mem.toDF().toDF("vec_id", "embedding", "label"), cents, floor = 0.5)
      .writeStream.format("memory").queryName("sogate")
      .outputMode("append").start()
    mem.addData(rows(3), rows(1), rows(4)) // out of order across batches
    q.processAllAvailable()
    mem.addData(rows(0), rows(2))
    q.processAllAvailable()
    q.stop()
    def keyOf(r: org.apache.spark.sql.Row) =
      r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        r.getBoolean(3))
    val streamed = spark.table("sogate").collect().map(keyOf).toMap
    val batch = StreamOps.streamingOutlierGate(
        rows.toDF("vec_id", "embedding", "label"), cents, floor = 0.5)
      .collect().map(keyOf).toMap
    assert(streamed == batch, s"stream $streamed vs batch $batch")
    assert(batch(1L)._2 && batch(3L)._2, "on-centroid vectors keep")
    assert(!batch(2L)._2, "orthogonal vector drops")
    assert(batch(4L) == ((None, false)), "untrained label must fail closed")
    assert(batch(5L) == ((None, false)),
      "zero-norm vector must fail closed, not NaN-keep")
    intercept[IllegalArgumentException] {
      StreamOps.streamingOutlierGate(
        rows.toDF("vec_id", "embedding", "label"), Seq.empty, floor = 0.5)
    }
    // an ingest schema with a LONG label column must still look up the
    // Int-keyed map, and a label past Int range must fail CLOSED (a
    // bare int cast would wrap 2^32+1 onto trained label 1)
    val longLabeled = Seq(
      (1L, Seq(2.0f, 0.0f), 0L),
      (6L, Seq(1.0f, 0.0f), (1L << 32) + 1L))
      .toDF("vec_id", "embedding", "label")
    val wide = StreamOps.streamingOutlierGate(longLabeled, cents, floor = 0.5)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(wide(1L), "long-typed in-range label must match its centroid")
    assert(!wide(6L), "int-overflow label must fail closed, not wrap")
  }

  test("streamingBoilerplate: threshold crossing, within-doc repeats count once") {
    val s = spark
    import s.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = StreamOps.streamingBoilerplate(
        mem.toDF().toDF("doc_id", "text"), minDocs = 3L)
      .writeStream.format("memory").queryName("boiler")
      .outputMode("update").start()
    mem.addData((1L, "cookie banner\nalpha"), (2L, "cookie banner\nbeta"))
    q.processAllAvailable()
    mem.addData((3L, "dup\ndup\ndup"))          // one doc, 3 occurrences
    q.processAllAvailable()
    mem.addData((4L, " cookie banner \ngamma")) // 3rd distinct doc, padded
    q.processAllAvailable()
    // same line from two docs in ONE batch, one of them repeating it:
    // the order-insensitive per-batch distinct must count exactly 2
    // regardless of how (5, 6, 5) interleave across input partitions
    mem.addData((5L, "inter\ninter"), (6L, "inter"), (5L, "inter"))
    q.processAllAvailable()
    q.stop()
    // last state per line hash (Update mode re-emits per batch)
    val rows = spark.table("boiler").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val last = rows.groupBy(_._1).map { case (h, rs) =>
      h -> rs.maxBy(_._2) }
    def ph(x: String) = graft.functions.PolyHash.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(x),
      graft.functions.PolyHash.DefaultBase)
    val banner = ph("cookie banner")
    val dup = ph("dup")
    assert(last(banner) == ((banner, 3L, true)),
      s"banner must cross at the 3rd distinct doc: ${last(banner)}")
    assert(last(dup) == ((dup, 1L, false)),
      s"within-doc repeats count once: ${last(dup)}")
    val inter = ph("inter")
    assert(last(inter) == ((inter, 2L, false)),
      s"interleaved same-batch docs count distinct: ${last(inter)}")
    // the crossing happened in one batch (banner's 3rd distinct doc)
    assert(rows.count(r => r._1 == banner && r._3) == 1)
  }

  test("streamingDsirGate: stream scores equal the batch weights") {
    val s = spark
    import s.implicits._
    implicit val ctx = spark.sqlContext
    // train on a small corpus (target = source 'a'), freeze the table
    val corpus = Seq(
      (1L, "alpha beta alpha beta alpha beta", "a"),
      (2L, "gamma delta gamma delta", "b"),
      (3L, "alpha beta gamma", "b"),
      (4L, "solo", "b"))
      .toDF("doc_id", "text", "source")
      .withColumn("n_chars", length($"text").cast("long"))
    val weights = operators.DataSelection.bucketWeightsOf(corpus)
    val mem = MemoryStream[(Long, String, String)]
    val q = StreamOps.streamingDsirGate(
        mem.toDF().toDF("doc_id", "text", "source"), weights)
      .writeStream.format("memory").queryName("dsirgate")
      .outputMode("append").start()
    mem.addData((3L, "alpha beta gamma", "b"), (1L, "alpha beta alpha beta alpha beta", "a"))
    q.processAllAvailable()
    mem.addData((4L, "solo", "b"), (2L, "gamma delta gamma delta", "b"))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("dsirgate").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val batch = operators.DataSelection.weightsOf(corpus).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(streamed == batch, s"stream $streamed vs batch $batch")
    assert(streamed(4L) == 0L, "featureless doc scores the neutral 0")
  }

  test("streamingDecontaminate: stream-static join flags the batch set") {
    val s = spark
    import s.implicits._
    implicit val ctx = spark.sqlContext
    val benchText = "alpha beta gamma delta epsilon zeta"
    val corpus = Seq(
      (10L, "web", s"intro words then $benchText afterwards"), // contaminated
      (11L, "web", "totally unrelated content with no overlap at all here"),
      (12L, "books", benchText))                               // contaminated
    // static side: the benchmark's distinct gram hashes
    val bench = Seq((1L, graft.operators.CorpusOps.BenchmarkSource, benchText))
      .toDF("doc_id", "source", "text")
      .select(explode(graft.functions.WordNgramHashes(
        $"text", graft.operators.CorpusOps.DecontamN)).as("gh"))
      .distinct()
    val mem = MemoryStream[(Long, String, String)]
    val q = StreamOps.streamingDecontaminate(
        mem.toDF().toDF("doc_id", "source", "text"), bench)
      .writeStream.format("memory").queryName("sdecon")
      .outputMode("append").start()
    mem.addData(corpus(0), corpus(1))
    q.processAllAvailable()
    mem.addData(corpus(2))
    q.processAllAvailable()
    q.stop()
    val flagged = spark.table("sdecon").select($"doc_id")
      .collect().map(_.getLong(0)).toSet
    // batch twin over the union of benchmark + corpus rows
    val batch = graft.operators.CorpusOps.decontaminateOn(
      ((1L, graft.operators.CorpusOps.BenchmarkSource, benchText) +: corpus)
        .toDF("doc_id", "source", "text"))
      .filter($"n_contaminated" > 0).select($"source")
      .collect().map(_.getString(0)).toSet
    assert(flagged == Set(10L, 12L), s"flagged docs: $flagged")
    assert(batch == Set("web", "books"), s"batch sources: $batch")
  }

  test("streamingDedup: duplicate content dropped across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val q = StreamOps.streamingDedup(
        mem.toDF().toDF("ts", "doc_id", "text"), watermark = "1 hour")
      .writeStream.format("memory").queryName("sdedup")
      .outputMode("append").start()
    mem.addData(
      (ts("2026-01-01 00:00:00"), 1L, "alpha beta gamma"),
      (ts("2026-01-01 00:01:00"), 2L, "delta epsilon"),
      (ts("2026-01-01 00:02:00"), 3L, "alpha beta gamma")) // dup of 1 in-batch
    q.processAllAvailable()
    mem.addData(
      (ts("2026-01-01 00:10:00"), 4L, "alpha beta gamma"),  // dup of 1 cross-batch
      (ts("2026-01-01 00:11:00"), 5L, "zeta eta"))
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("sdedup").select($"doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 5L),
      s"each content emitted once, duplicates suppressed; got $kept")
  }

  test("streamingDedup: state survives a checkpointed restart") {
    // the streaming fault-tolerance story: stop the query, start a new
    // one from the same checkpoint, and the dedup state store must
    // still know what it has seen (the reference's retry-forever loop,
    // master.py:61-89, re-expressed as Structured Streaming recovery)
    val s = spark
    import s.implicits._
    implicit val ctx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt")
    val (out, ckpt) = (dir.resolve("out").toString, dir.resolve("ckpt").toString)
    val mem = MemoryStream[(Timestamp, Long, String)]
    def startQuery() = StreamOps.streamingDedup(
        mem.toDF().toDF("ts", "doc_id", "text"), watermark = "1 hour")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val q1 = startQuery()
    mem.addData(
      (ts("2026-01-01 00:00:00"), 1L, "alpha beta"),
      (ts("2026-01-01 00:01:00"), 2L, "gamma delta"))
    q1.processAllAvailable()
    q1.stop()
    val q2 = startQuery() // restart from checkpoint
    mem.addData(
      (ts("2026-01-01 00:05:00"), 3L, "alpha beta"),   // dup across restart
      (ts("2026-01-01 00:06:00"), 4L, "epsilon zeta"))
    q2.processAllAvailable()
    q2.stop()
    val kept = spark.read.parquet(out).select($"doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 4L),
      s"recovered state must suppress the cross-restart duplicate; got $kept")
  }

  test("idempotent foreachBatch sink: restart re-delivery does not duplicate") {
    // kill the query AFTER the sink committed batch 0 but BEFORE the
    // checkpoint recorded it (simulated by reusing the sink with a
    // fresh checkpoint): the restarted query re-delivers the same rows
    // under a batch id the sink has already committed — the
    // exactly-once contract says the second delivery must be a no-op
    val s = spark
    import s.implicits._
    implicit val ctx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_eos_stream")
    val out = dir.resolve("out").toString
    val sink = graft.sources.Sinks.idempotentBatchSink(out)
    val rows = Seq((1L, "a"), (2L, "b"))
    def runOnce(): Unit = {
      val mem = MemoryStream[(Long, String)]
      val q = mem.toDF().toDF("id", "v").writeStream
        .foreachBatch(sink)
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft_eos_ck").toString)
        .start()
      mem.addData(rows: _*)
      q.processAllAvailable()
      q.stop()
    }
    runOnce()
    runOnce() // lost checkpoint → batch 0 re-delivered from scratch
    val back = spark.read.parquet(out)
    assert(back.count() == rows.length,
      s"re-delivered batch must not duplicate; got ${back.count()} rows")
  }

  test("streamingDedup: version-gated key — v1 checkpoints restart on v1, not v2") {
    // the migration contract: a deployment holding checkpoints written
    // by the legacy two-base key restarts unchanged with keyVersion = 1;
    // pointing the WIDENED key at the same checkpoint fails Spark's
    // state-schema validation at restart (loudly, not as silent dup
    // re-admission) — which is exactly why the gate exists
    val s = spark
    import s.implicits._
    implicit val ctx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_v1")
    val (out, ckpt) = (dir.resolve("out").toString, dir.resolve("ckpt").toString)
    val mem = MemoryStream[(Timestamp, Long, String)]
    def startQuery(ver: Int) = StreamOps.streamingDedup(
        mem.toDF().toDF("ts", "doc_id", "text"),
        watermark = "1 hour", keyVersion = ver)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    assert(StreamOps.keyBasesFor(1) == StreamOps.keyBasesFor(2).take(2))
    val q1 = startQuery(1) // "old binary" writes a v1 checkpoint
    mem.addData(
      (ts("2026-01-01 00:00:00"), 1L, "alpha beta"),
      (ts("2026-01-01 00:01:00"), 2L, "gamma delta"))
    q1.processAllAvailable()
    q1.stop()
    val q2 = startQuery(1) // legacy deployment restarts unchanged
    mem.addData(
      (ts("2026-01-01 00:05:00"), 3L, "alpha beta"), // dup across restart
      (ts("2026-01-01 00:06:00"), 4L, "epsilon zeta"))
    q2.processAllAvailable()
    q2.stop()
    val kept = spark.read.parquet(out).select($"doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 4L),
      s"v1 restart must keep suppressing duplicates; got $kept")
    val q3 = startQuery(2) // widened key on the v1 checkpoint: refuse
    try intercept[Exception] {
      mem.addData((ts("2026-01-01 00:10:00"), 5L, "theta iota"))
      q3.processAllAvailable()
      // if validation somehow passed, fail explicitly
      throw new AssertionError(
        "v2 key restarted from a v1 checkpoint without a schema error")
    } finally q3.stop()
  }

  test("streamingCdcLatest: one snapshot per key, late updates never regress") {
    val s = spark
    import s.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val q = StreamOps.streamingCdcLatest(
        mem.toDS().map { case (u, t, id, ty, v) =>
          StreamOps.CdcEvent(u, t, id, ty, v) })
      .writeStream.format("memory").queryName("scdc")
      .outputMode("update").start()
    mem.addData(
      (1L, ts("2026-01-01 10:00:00"), 1L, "view", 1.0),
      (1L, ts("2026-01-01 10:05:00"), 2L, "click", 2.34567),
      (2L, ts("2026-01-01 10:01:00"), 3L, "view", 3.0))
    q.processAllAvailable()
    mem.addData(
      (1L, ts("2026-01-01 10:03:00"), 4L, "error", 9.0), // OLDER than id 2
      (2L, ts("2026-01-01 10:06:00"), 5L, "purchase", 5.0),
      (3L, ts("2026-01-01 10:06:00"), 6L, "view", 6.0),
      (3L, ts("2026-01-01 10:06:00"), 7L, "click", 7.0)) // same-second tie
    q.processAllAvailable()
    q.stop()
    val byUser = spark.table("scdc").collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r => (r.getLong(1), r.getString(2), r.getDouble(3)))
        .toSet).toMap
    // the late out-of-order change for user 1 must never have emitted a
    // regressed snapshot in ANY trigger
    assert(byUser(1L) == Set((2L, "click", 2.3457)),
      s"late update regressed the snapshot: ${byUser(1L)}")
    // user 2 progressed 3 → 5 across triggers
    assert(byUser(2L).map(_._1) == Set(3L, 5L))
    // same-second pair breaks by event_id in every emission
    assert(byUser(3L) == Set((7L, "click", 7.0)))
  }

  test("streamingUserFeatures: out-of-order prefix equals the batch aggregation") {
    val s = spark
    import s.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val q = StreamOps.streamingUserFeatures(
        mem.toDS().map { case (u, t, id, ty, v) =>
          StreamOps.CdcEvent(u, t, id, ty, v) })
      .writeStream.format("memory").queryName("suf")
      .outputMode("update").start()
    val batch1 = Seq(
      (1L, ts("2026-01-02 10:00:00"), 1L, "view", 1.0),
      (1L, ts("2026-01-02 10:05:00"), 2L, "purchase", 2.5),
      (2L, ts("2026-01-03 09:00:00"), 3L, "click", 3.0))
    val batch2 = Seq(
      (1L, ts("2026-01-01 23:59:59"), 4L, "purchase", 4.25), // out of order
      (1L, ts("2026-01-02 11:00:00"), 5L, "click", 0.5),
      (2L, ts("2026-01-03 09:30:00"), 6L, "error", 1.0))
    mem.addData(batch1: _*)
    q.processAllAvailable()
    mem.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()
    // last emission per user == batch operator over the whole stream
    val last = spark.table("suf").collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.maxBy(_.getLong(1))).toMap // n_events grows per trigger
    val batchRows = graft.operators.EventAnalytics.userFeaturesOn(
        (batch1 ++ batch2).toDF("user_id", "ts", "event_id", "event_type", "value"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(last.keySet == batchRows.keySet)
    batchRows.foreach { case (uid, b) =>
      val st = last(uid)
      (1 to 7).foreach(i => assert(st.getLong(i) == b.getLong(i),
        s"user $uid col $i: ${st.getLong(i)} != ${b.getLong(i)}"))
      assert(st.getTimestamp(8) == b.getTimestamp(8))
      assert(st.getTimestamp(9) == b.getTimestamp(9))
      // both sides round to 4 decimals from DIFFERENT summation orders
      // (arrival-order running sum vs batch partial aggregation), so the
      // contract tolerance is half a unit in the 4th decimal — a 1e-9
      // tolerance would flake on a non-exact binary sum (advisor, r4)
      assert(math.abs(st.getDouble(10) - b.getDouble(10)) < 5e-5)
    }
  }

  test("streamingHeavyHitters: counts accumulate across batches, state bounded") {
    val s = spark
    import s.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[String]
    val q = StreamOps.streamingHeavyHitters(mem.toDS(), buckets = 4, capacity = 3)
      .writeStream.format("memory").queryName("shh")
      .outputMode("update").start()
    mem.addData(List.fill(50)("hot") ++ (0 until 20).map(i => s"n$i"): _*)
    q.processAllAvailable()
    mem.addData(List.fill(30)("hot") ++ (0 until 20).map(i => s"m$i"): _*)
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("shh")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    // the hot word's running lower bound reflects BOTH batches: after
    // batch 2 it must exceed anything one batch alone could give it
    val hotAfter = rows.filter(_._2 == "hot").map(_._3).max
    assert(hotAfter > 50L, s"state must carry batch-1 counts forward: $hotAfter")
    // ≤ capacity candidates per bucket in any single emission — noise
    // words can never accumulate unbounded state
    rows.groupBy(_._1).foreach { case (b, rs) =>
      assert(rs.map(_._2).distinct.size <= 3 * 2, // 2 emissions per bucket max
        s"bucket $b emitted too many distinct words")
    }
  }
}
