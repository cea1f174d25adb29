package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.functions.FrequentWords
import graft.operators.TextAnalysis

/** The Misra-Gries candidate pass must (a) keep bounded state, (b)
  * provably retain every true heavy hitter at any partitioning — the
  * property that makes the exact second pass of `heavy_hitters`
  * deterministic — and the end-to-end operator must equal the naive
  * exact computation. */
class FrequentWordsSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("MG summary retains every item above N/(capacity+1) under skew") {
    val s = spark
    import s.implicits._
    // 3 heavy items (1000/600/300 of N=2500) drowned in 600 singletons,
    // shuffled so heavy occurrences cluster badly across partitions
    // the MG guarantee is order-independent (any interleaving retains
    // the heavy items), but seed the shuffle so a failure reproduces
    val rows = new scala.util.Random(42).shuffle(
      (List.fill(1000)("hot") ++ List.fill(600)("warm") ++
        List.fill(300)("mild") ++ (0 until 600).map(i => s"one$i")).toList)
    for (parts <- Seq(1, 7)) {
      val df = s.sparkContext.parallelize(rows, parts).toDF("w")
      val cands = df.agg(FrequentWords($"w", 8).as("c"))
        .head().getSeq[String](0)
      assert(cands.size <= 8, s"capacity violated: ${cands.size}")
      // N/(capacity+1) = 2500/9 ≈ 278 — all three must survive
      assert(Seq("hot", "warm", "mild").forall(cands.contains),
        s"lost a guaranteed heavy hitter in $cands (parts=$parts)")
    }
  }

  test("MG superset guarantee holds for arbitrary streams (property)") {
    import org.scalacheck.Gen
    import org.scalacheck.Prop.forAll
    // sequential plain-Scala MG over the same mgUpdate step the
    // aggregate and the streaming op share — the property is the
    // textbook guarantee: every item with freq > N/(cap+1) survives
    val gen = for {
      cap <- Gen.choose(2, 12)
      words <- Gen.listOf(Gen.oneOf(
        Gen.const("heavy"), Gen.const("semi"),
        Gen.choose(0, 500).map(i => s"w$i")))
    } yield (cap, words)
    val prop = forAll(gen) { case (cap, words) =>
      val m = scala.collection.mutable.HashMap.empty[String, Long]
      words.foreach(w => graft.functions.FrequentWords.mgUpdate(m, w, cap))
      assert(m.size <= cap)
      val n = words.size
      val freq = words.groupBy(identity).view.mapValues(_.size.toLong)
      freq.forall { case (w, f) =>
        f * (cap + 1) <= n || m.contains(w)
      }
    }
    assert(org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(300),
      prop).passed)
  }

  test("heavy_hitters == naive exact GROUP BY result") {
    val s = spark
    import s.implicits._
    val dir = "/root/testdata/sf0.001"
    val got = TextAnalysis.heavyHitters(s, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val words = Tables(s, dir, "documents")
      .select(explode(graft.functions.TextFeatures.toks(lower($"text"))).as("w"))
    val total = words.count()
    val want = words.groupBy($"w").agg(count(lit(1)).as("cnt"))
      .filter($"cnt" * TextAnalysis.HhDenom > lit(total))
      .orderBy($"w")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(want.nonEmpty, "test data should have heavy hitters")
    assert(got == want)
  }

  test("non-string input fails at analysis, not mid-job") {
    val s = spark
    import s.implicits._
    val df = Seq(1L, 2L).toDF("x")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.agg(FrequentWords($"x", 4)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("type"))
  }

  test("BoundedCollect non-bigint input fails at analysis, not mid-job") {
    val s = spark
    import s.implicits._
    val df = Seq("a", "b").toDF("x")
    intercept[org.apache.spark.sql.AnalysisException] {
      df.agg(graft.functions.BoundedCollect($"x", 4)).collect()
    }
  }
}
