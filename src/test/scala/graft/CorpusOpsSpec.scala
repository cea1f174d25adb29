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
    // benchmark (src0) text into another source — it MUST be flagged
    val docs = Tables(spark, sf, "documents")
    val benchText = docs.filter($"source" === CorpusOps.BenchmarkSource)
      .orderBy(length($"text").desc).select($"text").head().getString(0)
    val planted = Seq((999999L, benchText, "en", "srcX", benchText.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val hashed = docs.unionByName(planted)
      .withColumn("hs", graft.functions.WordNgramHashes($"text", CorpusOps.DecontamN))
      .select($"doc_id", $"source", explode($"hs").as("gh"))
    val bench = hashed.filter($"source" === CorpusOps.BenchmarkSource)
      .select($"gh").distinct()
    val flagged = hashed.filter($"source" === "srcX")
      .join(broadcast(bench), Seq("gh"), "left_semi")
      .select($"doc_id").distinct().collect()
    assert(flagged.map(_.getLong(0)).contains(999999L))
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
}
