package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.operators.DataSelection

/** DSIR estimator laws (exact values are DuckDB-oracle-checked via the
  * driver contract; these are the statistical behaviors the selection
  * stage exists to deliver): target-domain documents score higher than
  * the raw average, weights are additive over feature occurrences (bag
  * semantics), featureless documents score exactly zero, and the
  * selection cut keeps exactly ceil(n/4) globally. */
class DataSelectionSpec extends AnyFunSuite with BeforeAndAfterAll {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def corpus(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "source")
      .withColumn("n_chars", length($"text").cast("long"))
  }

  test("target-domain docs outscore the raw corpus average") {
    import spark.implicits._
    val w = DataSelection.weightsOf(Tables(spark, sf, "documents"))
      .select($"source", $"w_bits").as[(String, Long)].collect()
    val target = w.collect { case (s, b) if s == w.map(_._1).min => b }
    val rest = w.collect { case (s, b) if s != w.map(_._1).min => b }
    assert(target.nonEmpty && rest.nonEmpty)
    assert(target.map(_.toDouble).sum / target.length >
      rest.map(_.toDouble).sum / rest.length,
      "DSIR must rank the target domain above the raw average")
  }

  test("weights are additive over occurrences; featureless docs are 0") {
    import spark.implicits._
    // target trains on source 'a' (lexicographically first); doc 30
    // repeats the target-like bigram twice as often as doc 20, and its
    // weight contribution from that bigram must exactly double
    val docs = corpus(Seq(
      (1L, "alpha beta alpha beta alpha beta", "a"),
      (2L, "gamma delta gamma delta", "b"),
      (10L, "solo", "b"), // one token -> zero features
      (20L, "alpha beta", "b"),
      (30L, "alpha beta alpha beta", "b")))
    val w = DataSelection.weightsOf(docs)
      .select($"doc_id", $"n_feats", $"w_bits")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(w(10L) == ((0L, 0L)), "a featureless doc scores exactly zero")
    val (n20, b20) = w(20L)
    val (n30, b30) = w(30L)
    assert(n20 == 1L && n30 == 3L)
    // doc 30 = grams {alpha-beta x2, beta-alpha x1}; doc 20 = {alpha-beta}.
    // additivity: w30 = 2*w20 + w(beta-alpha), checkable through doc 1's
    // composition: doc1 has alpha-beta x3 + beta-alpha x2
    val (n1, b1) = w(1L)
    assert(n1 == 5L)
    // solve: b1 = 3*ab + 2*ba, b30 = 2*ab + ba, b20 = ab
    val ab = b20
    val ba = b30 - 2 * ab
    assert(b1 == 3 * ab + 2 * ba, "per-bucket weights must be additive")
  }

  test("the selection cut keeps exactly ceil(n/4) documents") {
    import spark.implicits._
    val sel = DataSelection.dsirSample(spark, sf)
      .select($"n_docs", $"n_sel").as[(Long, Long)].collect()
    val n = sel.map(_._1).sum
    assert(sel.map(_._2).sum == (n + DataSelection.SelDen - 1) / DataSelection.SelDen)
  }

  test("trained registry path featurizes the corpus exactly once") {
    import org.apache.spark.sql.catalyst.plans.logical.Generate
    // the generic one-shot surface pays two featurizations (fit +
    // score); the registry queries train via the memoized table and
    // must plan exactly ONE gram explode — the dsir_train_build
    // accounting upgrade is this assertion
    def generates(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.collect { case g: Generate => g }.length
    DataSelection.clearTrainCache()
    DataSelection.clearScoreCache()
    // generic surface: the fit leg featurizes for the bucket counts AND
    // for their broadcast total (the counts subtree appears under both
    // sides of the crossJoin), plus the scoring scan = 3 explodes
    assert(generates(DataSelection.weightsOf(
      Tables(spark, sf, "documents"))) >= 2, "generic surface: fit + score")
    // the score BUILD featurizes exactly once (scoring scan against the
    // broadcast trained table) ...
    assert(generates(DataSelection.scoredBy(Tables(spark, sf, "documents"),
      DataSelection.trainWeights(spark, sf))) == 1,
      "score build must featurize once")
    // ... and the registered queries consume the memoized localCheckpoint
    // table: ZERO featurizations in their plans (round-10 score-once —
    // the corpus is featurized once per (session, dir), in the build)
    assert(generates(SparkEntry.queries("dsir_weights")(spark, sf)) == 0,
      "registered path must consume the materialized score table")
    assert(generates(SparkEntry.queries("dsir_sample")(spark, sf)) == 0,
      "registered path must consume the materialized score table")
    // and the trained table IS the fitted table: scoring through it
    // reproduces the generic surface's weights exactly
    import spark.implicits._
    val a = DataSelection.weightsOf(Tables(spark, sf, "documents"))
      .orderBy($"doc_id").collect().toSeq
    val b = DataSelection.scoredBy(Tables(spark, sf, "documents"),
      DataSelection.trainWeights(spark, sf)).orderBy($"doc_id").collect().toSeq
    assert(a == b, "trained scoring must equal the one-shot surface")
  }

  test("dsir_sample_approx: window-free plan, volumes conserved, cut tracks the exact rank") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val approx = DataSelection.dsirSampleApprox(spark, sf)
    assert(approx.queryExecution.optimizedPlan.collect {
      case w: LWindow => w }.isEmpty, "approx twin must be window-free")
    val a = approx.select($"source", $"n_docs", $"n_sel")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val e = DataSelection.dsirSample(spark, sf)
      .select($"source", $"n_docs", $"n_sel")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(a.keySet == e.keySet, "per-source report must cover the same sources")
    // n_docs counts EVERY document regardless of the cut: exact match
    for (s <- e.keys) assert(a(s)._1 == e(s)._1, s"$s: n_docs differs")
    // total selected volume: the sketch is rank-exact below its
    // accuracy, so drift is only weight-tie mass at the threshold
    val n = e.values.map(_._1).sum
    val bound = math.max(3L, n / 10)
    val (aSel, eSel) = (a.values.map(_._2).sum, e.values.map(_._2).sum)
    assert(math.abs(aSel - eSel) <= bound,
      s"selected volume drift: approx=$aSel exact=$eSel bound=$bound")
    assert(aSel > 0 && aSel < n, "the cut must actually select a proper subset")
  }

  test("the ranking head is consistent with the weight frame") {
    import spark.implicits._
    val top = DataSelection.dsirWeights(spark, sf).collect()
    assert(top.length == DataSelection.TopDocs)
    val best = DataSelection.weightsOf(Tables(spark, sf, "documents"))
      .orderBy($"w_bits".desc, $"doc_id").limit(1)
      .select($"doc_id").as[Long].head()
    assert(top.head.getLong(0) == best)
  }
}
