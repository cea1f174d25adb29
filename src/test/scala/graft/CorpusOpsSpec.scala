package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.operators.CorpusOps

/** Corpus-management operator invariants on the sf0.001 testdata. */
class CorpusOpsSpec extends AnyFunSuite with BeforeAndAfterAll {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("decontaminate: benchmark source excluded, rates within [0,1]") {
    val out = CorpusOps.decontaminate(spark, sf).collect()
    assert(out.nonEmpty)
    assert(!out.exists(_.getString(0) == CorpusOps.BenchmarkSource))
    out.foreach { r =>
      val (n, cont, rate) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(cont >= 0 && cont <= n)
      assert(rate >= 0.0 && rate <= 1.0)
      assert(math.abs(rate - cont.toDouble / n) < 1e-3)
    }
  }

  test("decontaminate: a planted copy of a benchmark doc is flagged") {
    import spark.implicits._
    // corpus = testdata plus one document that verbatim-copies a
    // benchmark (src0) text into another source — the REAL operator
    // must flag it (decontaminateOn runs the production pipeline)
    val docs = Tables(spark, sf, "documents")
    val benchText = docs.filter($"source" === CorpusOps.BenchmarkSource)
      .orderBy(length($"text").desc).select($"text").head().getString(0)
    val planted = Seq((999999L, benchText, "en", "srcX", benchText.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = CorpusOps.decontaminateOn(docs.unionByName(planted)).collect()
    val srcX = out.find(_.getString(0) == "srcX")
    assert(srcX.isDefined, "planted source must appear in the report")
    assert(srcX.get.getLong(1) == 1L && srcX.get.getLong(2) == 1L,
      s"the verbatim copy must be contaminated: ${srcX.get}")
    assert(srcX.get.getDouble(3) == 1.0)
  }

  test("pack_sequences: fill ratio bounded, sequences cover the tokens") {
    val out = CorpusOps.packSequences(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (nSeqs, total, fill) = (r.getLong(2), r.getLong(3), r.getDouble(5))
      assert(nSeqs >= 1L)
      assert(fill > 0.0 && fill <= 1.0, s"fill must be a true ratio: $r")
      // n_seqs is exactly the budget-quanta the tokens consume
      assert(nSeqs == math.max((total + CorpusOps.PackBudget - 1) / CorpusOps.PackBudget, 1L))
      assert(r.getLong(4) >= 1L) // max_docs_per_seq
    }
  }

  test("sample_split: deterministic, covers every doc, all splits present") {
    val a = CorpusOps.sampleSplit(spark, sf).collect()
    val b = CorpusOps.sampleSplit(spark, sf).collect()
    assert(a.toSeq == b.toSeq, "split is deterministic")
    val total = a.map(_.getLong(2)).sum
    assert(total == Tables(spark, sf, "documents").count())
    val splits = a.map(_.getString(1)).toSet
    assert(splits == Set("train", "val", "test"),
      s"all three splits should appear overall, got $splits")
    // train should dominate: it owns 90 of 100 hash buckets
    val bySplit = a.groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(2)).sum)
    assert(bySplit("train") > bySplit("val") + bySplit("test"))
  }

  test("group_sample: k per source, partition-independent, group-limited plan") {
    val out = CorpusOps.groupSample(spark, sf)
    val rows = out.collect()
    val perSource = rows.groupBy(_.getString(0)).view.mapValues(_.length)
    assert(perSource.values.forall(_ == CorpusOps.SampleK))
    // the sample is a property of the DATA, not the partitioning: a
    // repartitioned input yields the identical sample
    import org.apache.spark.sql.functions._
    val docs = Tables(spark, sf, "documents").repartition(13, col("lang"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(col("h"), col("doc_id"))
    val again = docs
      .withColumn("h", graft.functions.PolyHash(col("doc_id").cast("string")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= CorpusOps.SampleK)
      .select(col("source"), col("rk"), col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("source"), col("rk"))
      .collect()
    assert(rows.toSeq == again.toSeq)
    // scale shape: the rank filter must push a WindowGroupLimit below
    // the exchange so the shuffle carries ≤ k rows/source/partition
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected a WindowGroupLimit in:\n$plan")
  }

  test("source_quota: keeps ceil(0.6n) per source; approx twin window-free, drift-bounded") {
    val exact = CorpusOps.sourceQuota(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(exact.nonEmpty)
    exact.values.foreach { r =>
      val (n, kept) = (r.getLong(1), r.getLong(2))
      assert(kept == math.ceil(n * CorpusOps.SourceQuotaFrac).toLong,
        s"${r.getString(0)}: kept $kept of $n")
      assert(!r.isNullAt(4), "cut_score must be defined")
    }
    val approxDf = CorpusOps.sourceQuotaApprox(spark, sf)
    // shipped twin must have NO window anywhere in the optimized plan
    val windows = approxDf.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.isEmpty, "approx twin must be window-free")
    val approx = approxDf.collect().map(r => r.getString(0) -> r).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (src, r) =>
      val (n, kept) = (r.getLong(1), r.getLong(2))
      val exactKept = exact(src).getLong(2)
      assert(n == exact(src).getLong(1))
      // percentile_approx at accuracy 10000 on per-source groups this
      // size is near-exact; allow tie-mass slack of 2% of the source
      assert(math.abs(kept - exactKept) <= math.max(2L, n / 50),
        s"$src: approx kept $kept vs exact $exactKept of $n")
    }
  }

  test("source_mix: exact integer rates, smallest source fully kept, deterministic") {
    import spark.implicits._
    // source A: 4 docs × 5 words = 20 tokens; B: 2 docs × 5 = 10 →
    // min = 10, rate_A = 5000/10000, rate_B = 10000/10000 (all kept)
    val mk = (i: Int) => s"w${i}a w${i}b w${i}c w${i}d w${i}e"
    val docs = ((1 to 4).map(i => (i.toLong, "A", mk(i))) ++
      (5 to 6).map(i => (i.toLong, "B", mk(i)))).toDF("doc_id", "source", "text")
    val out = CorpusOps.sourceMixOn(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    // columns: source, n_docs, n_kept, tokens_in, tokens_kept,
    //          target_rate, achieved_rate
    val a = out("A")
    assert(a.getLong(5) == 5000L, s"rate_A: ${a.getLong(5)}")
    assert(a.getLong(1) == 4L && a.getLong(3) == 20L)
    assert(a.getLong(4) == a.getLong(2) * 5, "token totals must be words-exact")
    val b = out("B")
    assert(b.getLong(5) == 10000L, "the smallest source gets rate 1.0")
    assert(b.getLong(1) == 2L && b.getLong(2) == 2L && b.getDouble(6) == 1.0,
      "rate 10000 must keep every doc")
    assert(b.getLong(4) == 10L)
    // keep decisions are pure hash — a second run is bit-identical
    val again = CorpusOps.sourceMixOn(docs).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(again("A") == a.getLong(2) && again("B") == 2L)
  }

  test("source_mix_temp: sqrt rates sit between the flat cut and full keep") {
    import spark.implicits._
    // A: 16 docs × 5 = 80 tokens, B: 4 docs × 5 = 20 → min = 20.
    // plain mix rate_A = 2500; temperature rate_A = ⌊10⁴·√(1/4)⌋ = 5000
    val mk = (i: Int) => s"w${i}a w${i}b w${i}c w${i}d w${i}e"
    val docs = ((1 to 16).map(i => (i.toLong, "A", mk(i))) ++
      (17 to 20).map(i => (i.toLong, "B", mk(i)))).toDF("doc_id", "source", "text")
    val out = CorpusOps.sourceMixTempOn(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = out("A")
    assert(a.getLong(5) == 5000L, s"temp rate_A = sqrt(1/4): ${a.getLong(5)}")
    val b = out("B")
    assert(b.getLong(5) == 10000L && b.getLong(1) == b.getLong(2),
      "the smallest source keeps everything")
    // gentler than the flat mix on the SAME corpus, never above 1.0
    val flatA = CorpusOps.sourceMixOn(docs).collect()
      .map(r => r.getString(0) -> r.getLong(5)).toMap.apply("A")
    assert(flatA == 2500L && a.getLong(5) > flatA)
    // deterministic: a second run is bit-identical
    val again = CorpusOps.sourceMixTempOn(docs).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(again("A") == a.getLong(2) && again("B") == b.getLong(2))
  }

  test("source_mix: the rate table joins as a broadcast, corpus never shuffles rows") {
    val df = CorpusOps.sourceMix(spark, sf)
    val plan = df.queryExecution.executedPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val rowVolume = plan.collect { case e: ShuffleExchangeExec => e }
      .filter(_.child.schema.fieldNames.contains("doc_id"))
    assert(rowVolume.isEmpty,
      s"per-document rows must not shuffle (rates broadcast):\n$plan")
  }

  test("subword tokens: greedy prefix-closed matching, hand-checked") {
    import graft.functions.Subword
    import org.apache.spark.unsafe.types.UTF8String
    def cnt(s: String): Long = Subword.count(UTF8String.fromString(s))
    // vocab words tokenize to one unit via their prefix chain
    assert(cnt("the") == 1L && cnt("spark") == 1L && cnt("window") == 1L)
    assert(cnt("the spark") == 2L)
    // greedy split inside an unknown word: the|spark (thes ∉ vocab)
    assert(cnt("thespark") == 2L)
    // no multi-char unit applies → one token per character
    assert(cnt("zzz") == 3L)
    // whitespace handling: empty and blank count zero, runs collapse
    assert(cnt("") == 0L && cnt("  \t\n ") == 0L)
    assert(cnt(" the\n\nspark ") == 2L)
    // the vocab is prefix-closed (the greedy viability == membership
    // equivalence the DuckDB mirror depends on)
    Subword.Vocab.foreach { v =>
      (2 until v.length).foreach { l =>
        assert(Subword.Vocab.contains(v.substring(0, l)),
          s"prefix ${v.substring(0, l)} of $v missing")
      }
    }
    // subword count is bounded below by the whitespace count (every
    // word is ≥ 1 token) and above by character count
    val texts = Seq("batch part spark", "filter group query", "a bb ccc")
    texts.foreach { t =>
      val words = t.split("\\s+").count(_.nonEmpty)
      assert(cnt(t) >= words && cnt(t) <= t.length)
    }
  }

  test("subword tokens: column expression matches direct eval on real docs") {
    import graft.functions.Subword
    import org.apache.spark.unsafe.types.UTF8String
    val rows = Tables(spark, sf, "documents")
      .select(col("text"), Subword(lower(col("text"))).as("n")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val want = Subword.count(UTF8String.fromString(r.getString(0).toLowerCase))
      assert(r.getLong(1) == want)
    }
  }
}
