package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.functions.Log2Fixed
import graft.operators.LangModel

/** The LM filter's determinism rests on [[Log2Fixed]] never touching
  * libm — these pin (a) the algorithm's accuracy against the double
  * log it replaces, (b) the exact truncation semantics the DuckDB
  * unroll mirrors, and (c) the scoring plan's scale shape (bounded
  * model broadcast, no corpus-side shuffle join). */
class LangModelSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("Log2Fixed within one fixed-point ulp of -log2(a/b), never below") {
    val rng = new scala.util.Random(7)
    val cases = Seq.tabulate(5000) { _ =>
      val b = 1L + rng.nextInt(1 << 24)
      val a = 1L + (rng.nextLong().abs % b)
      (a, b)
    } ++ Seq((1L, 1L), (1L, 2L), (1L, 1L << 24), ((1L << 24) - 1, 1L << 24))
    for ((a, b) <- cases) {
      val got = Log2Fixed.bits(a, b)
      val want = -math.log(a.toDouble / b) / math.log(2.0) * Log2Fixed.Scale
      // frac bits truncate toward zero, so the fixed-point value can
      // only round the COST up: got ∈ [want, want + 1)
      assert(got >= want - 1e-6 && got < want + 1.0 + 1e-6,
        s"bits($a, $b) = $got, continuous = $want")
    }
  }

  test("Log2Fixed is monotone in the probability it scores") {
    // a/b decreasing => cost non-decreasing (the filter ranks by it)
    val b = 1000003L
    val costs = Seq(1000003L, 500000L, 10000L, 100L, 5L, 1L)
      .map(a => Log2Fixed.bits(a, b))
    assert(costs == costs.sorted, s"not monotone: $costs")
  }

  test("lm_score: model stays bounded and scoring join is broadcast") {
    // the registered query consumes the memoized score table (round-10
    // score-once), so the broadcast-join property is asserted on the
    // build path's plan — the scan trainScores materializes
    val plan = LangModel.docScores(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"scoring join must broadcast the bounded model, got:\n$plan")
    val df = LangModel.lmScore(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.length == LangModel.TopDocs)
    // xent = bits_sum / (n_events * 2^16) exactly, and every event was
    // scored (a lost join row would deflate n_events below the token
    // count the window produced)
    for (r <- rows) {
      val (n, bits, xent) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(n > 0 && bits > 0)
      assert(math.abs(xent - bits.toDouble / (n * Log2Fixed.Scale)) < 5e-5)
    }
  }

  test("source_kl: zero on itself, symmetric crafted shift, matches continuous KL") {
    import spark.implicits._
    // single source: p = q exactly, every term's two Log2Fixed calls
    // see identical (a, b) -> kl_bits is EXACTLY zero, not just small
    val one = graft.operators.LangModel.sourceKlOn(
      Seq((1L, "A", "x y z x y"), (2L, "A", "z z y")).toDF("doc_id", "source", "text"))
      .collect()
    assert(one.length == 1 && one(0).getDouble(3) == 0.0, one.mkString(","))

    // mirrored sources: A = {a:4, b:1}, B = {b:4, a:1} over corpus
    // q(a) = q(b) = 1/2 -> KL(A||q) = KL(B||q) = 0.8*log2(1.6) +
    // 0.2*log2(0.4) ~ 0.2781 bits/token, equal by symmetry
    val two = graft.operators.LangModel.sourceKlOn(
      Seq((1L, "A", "a a a a b"), (2L, "B", "b b b b a"))
        .toDF("doc_id", "source", "text"))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val want = 0.8 * math.log(1.6) / math.log(2.0) +
      0.2 * math.log(0.4) / math.log(2.0)
    assert(two("A") == two("B"), s"mirrored sources must tie: $two")
    assert(math.abs(two("A") - want) < 1e-3,
      s"continuous KL $want vs fixed-point ${two("A")}")

    // n_tokens / n_terms census columns
    val a = graft.operators.LangModel.sourceKlOn(
      Seq((1L, "A", "a a a a b"), (2L, "B", "b b b b a"))
        .toDF("doc_id", "source", "text")).collect().head
    assert(a.getLong(1) == 5L && a.getLong(2) == 2L, a.toString)
  }

  test("new operators are partitioning-invariant") {
    // the determinism the oracle gate implies but a skewed cluster
    // would actually test: identical results when the input arrives in
    // a different number of partitions (no accidental dependence on
    // row order, partial-agg grouping, or partition count)
    val dir = "/root/testdata/sf0.001"
    val base = spark.conf.get("spark.sql.shuffle.partitions")
    def results() = Seq("lm_score", "lm_buckets", "lm_domain", "bm25_topk",
      "lm_trigram", "lm_trigram_score",
      "dedup_spans", "span_redact", "corpus_card")
      .map(q => q -> SparkEntry.queries(q)(spark, dir).collect().toSeq).toMap
    val before = results()
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val after = results()
      for ((q, rows) <- before)
        assert(after(q) == rows, s"$q differs under 7 shuffle partitions")
    } finally spark.conf.set("spark.sql.shuffle.partitions", base)
  }

  test("lm_buckets_approx: window-free plan, mass conserved, bounded drift vs exact") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val dir = "/root/testdata/sf0.001"
    val approx = LangModel.lmBucketsApprox(spark, dir)
    // the whole point of the twin: no PARTITION-LESS window anywhere
    // (the exact form's global NTILE is what it replaces at 100 TB;
    // the doc_id-partitioned bigram lag legitimately remains)
    assert(approx.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty => w }.isEmpty,
      "approx twin must have no global window")
    val a = approx.collect().map(r => r.getInt(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val e = LangModel.lmBuckets(spark, dir).collect().map(r => r.getInt(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // every doc lands in exactly one bucket in both forms: the corpus
    // totals (docs, events, bits) must agree exactly
    def tot(m: Map[Int, (Long, Long, Long)], i: Int) = m.values.map {
      case (d, ev, b) => Seq(d, ev, b)(i) }.sum
    for (i <- 0 to 2) assert(tot(a, i) == tot(e, i), s"total column $i differs")
    // per-bucket volume drift: the sketch is rank-exact below its
    // accuracy, so the only drift is xent-tie mass at the cut points
    val n = tot(e, 0)
    val bound = math.max(3L, n / 10)
    for (b <- 1 to 3)
      assert(math.abs(a.getOrElse(b, (0L, 0L, 0L))._1 -
        e.getOrElse(b, (0L, 0L, 0L))._1) <= bound,
        s"bucket $b drift exceeds $bound: approx=${a.get(b)} exact=${e.get(b)}")
  }

  test("quality_calibration: mass conserved, buckets bound their scores") {
    val dir = "/root/testdata/sf0.001"
    val rows = LangModel.qualityCalibration(spark, dir).collect()
    assert(rows.nonEmpty)
    // every LM-scored doc carries exactly one heuristic bucket: doc and
    // token mass must reconcile with the score table's totals
    val scored = LangModel.trainScores(spark, dir).collect()
    assert(rows.map(_.getLong(1)).sum == scored.length,
      "bucketed docs must equal the scored-doc count")
    assert(rows.map(_.getLong(2)).sum == scored.map(_.getLong(1)).sum,
      "bucketed tokens must equal the scored event total")
    rows.foreach { r =>
      val b = r.getInt(0)
      val avg = r.getDouble(4)
      assert(avg >= b / 10.0 - 5e-5 && avg < (b + 1) / 10.0 + 5e-5,
        s"bucket $b avg_score $avg outside its decile")
      assert(r.getDouble(3) > 0.0, s"bucket $b xent must be positive")
    }
  }

  test("Log2Fixed rejects out-of-contract inputs loudly") {
    // the public log2_fixed SQL surface must not return garbage: a=0
    // previously died on a bare div-by-zero, a>b / b>=2^50 silently
    // returned wrong costs (round-6 advice)
    for ((a, b) <- Seq((0L, 5L), (-1L, 5L), (3L, 2L), (1L, 1L << 50))) {
      val e = intercept[IllegalArgumentException](Log2Fixed.bits(a, b))
      assert(e.getMessage.contains("contract"), s"($a,$b): ${e.getMessage}")
    }
    assert(Log2Fixed.bits(1L, (1L << 50) - 1) > 0) // boundary stays legal
  }

  test("lm_trigram: cost decomposition is exact and interpolation is the sum") {
    val s = spark
    import s.implicits._
    val rows = LangModel.lmTrigram(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (n3, a, b) = (r.getLong(r.fieldIndex("n3")),
        r.getLong(r.fieldIndex("a")), r.getLong(r.fieldIndex("b")))
      val (l3, l2, ib) = (r.getLong(r.fieldIndex("lbits")),
        r.getLong(r.fieldIndex("lbits2")), r.getLong(r.fieldIndex("ibits")))
      assert(a == n3 + 1 && a <= b, "add-1 numerator within contract")
      assert(l3 == Log2Fixed.bits(a, b), "trigram cost IS the shared algorithm")
      assert(ib == l3 + l2, "log-linear λ=1/2 interpolation = cost sum")
      assert(l2 >= 0 && l3 >= 0)
    }
  }

  test("lm_trigram_score: every trigram event is scored (self-trained inner join loses none)") {
    val s = spark
    import s.implicits._
    val dir = "/root/testdata/sf0.001"
    // xent in bits/token must be consistent with the integer sums under
    // the doubled (two stacked λ=1/2 log-costs) fixed-point scale
    val out = LangModel.lmTrigramScore(spark, dir).collect()
    assert(out.nonEmpty)
    for (r <- out) {
      val (n, bits, xent) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(n > 0 && bits > 0)
      assert(math.abs(xent - bits.toDouble / (n * 2 * Log2Fixed.Scale)) < 5e-5)
    }
  }

  test("quality_classifier: zero-token documents count, margin 0") {
    val s = spark
    import s.implicits._
    val out = LangModel.qualityClassifier(spark, "/root/testdata/sf0.001")
    assert(out.columns.toSeq ==
      Seq("lang", "n_docs", "n_keep", "sum_margin", "avg_margin"))
    val total = out.agg(sum($"n_docs")).as[Long].head()
    val nDocs = Tables(spark, "/root/testdata/sf0.001", "documents").count()
    assert(total == nDocs, "every document must be scored, token-less included")
  }

  test("clf_train: learned NB weights — full spine, identity, in-domain positivity") {
    val s = spark
    import s.implicits._
    val sf = "/root/testdata/sf0.001"
    val t = LangModel.clfTrain(spark, sf).collect()
    assert(t.length == 64 && t.map(_.getInt(0)).toSeq == (0 until 64),
      "one row per bucket, spine complete and ordered")
    // the weight is exactly the Log2Fixed log-likelihood ratio of the
    // counts the same row reports — the train table is self-verifying
    val pt = t.map(_.getLong(1)).sum
    val nt = t.map(_.getLong(2)).sum
    t.foreach { r =>
      val expect = graft.functions.Log2Fixed.bits(r.getLong(2) + 1, nt + 64) -
        graft.functions.Log2Fixed.bits(r.getLong(1) + 1, pt + 64)
      assert(r.getLong(3) == expect, s"bucket ${r.getInt(0)}")
    }
    // the learned scorer must actually separate: the in-domain source's
    // documents average a higher margin than the rest of the corpus
    val ws = LangModel.clfLearnedWeights(spark, sf)
    assert(ws.size == 64)
    assert(ws eq LangModel.clfLearnedWeights(spark, sf),
      "second call must hit the session memo")
    val docs = Tables(spark, sf, "documents")
    val ts = docs.agg(min($"source")).as[String].head()
    val m = docs.groupBy(($"source" === ts).as("pos"))
      .agg(avg(LangModel.marginWith($"text", ws)).as("am"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(m(true) > m(false),
      s"in-domain mean margin ${m(true)} must exceed out-of-domain ${m(false)}")
    intercept[IllegalArgumentException] {
      LangModel.marginWith($"text", Seq(1L, 2L))
    }
  }
}
