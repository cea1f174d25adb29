package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.operators.RelationalQueries

/** The approx-quantiles scale twin must track the exact form: same
  * schema, same groups, values within the sketch's rank-error bound.
  * With accuracy = 10000 the rank error is ≤ 1/10000, which on the
  * sf0.001 lineitem value range comfortably bounds the absolute error
  * below 1% of the per-group value spread. */
class QuantilesSpec extends AnyFunSuite with BeforeAndAfterAll {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("quantiles_approx matches exact quantiles within tolerance") {
    val exact = RelationalQueries.quantiles(spark, sf).collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val approx = RelationalQueries.quantilesApprox(spark, sf).collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(approx.keySet == exact.keySet, "same groups")
    // tolerance: 1% of the group's p99—p25 spread (rank error 1e-4 at
    // accuracy=10000 is far tighter; this bound is robust to data edits)
    for ((g, ex) <- exact) {
      val ap = approx(g)
      val spread = math.max(ex.last - ex.head, 1.0)
      ex.zip(ap).zipWithIndex.foreach { case ((e, a), i) =>
        assert(math.abs(e - a) <= 0.01 * spread,
          s"group $g quantile #$i: exact=$e approx=$a spread=$spread")
      }
    }
  }

  test("quantiles_approx has the same schema as quantiles") {
    val ex = RelationalQueries.quantiles(spark, sf)
    val ap = RelationalQueries.quantilesApprox(spark, sf)
    assert(ex.schema.fieldNames.sameElements(ap.schema.fieldNames))
  }

  test("dq_checks: full rule suite in one pass, honest pass/fail mix") {
    val df = RelationalQueries.dqChecks(spark, sf)
    val rows = df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(rows.length == 5)
    rows.foreach { case (_, violations, pass) =>
      assert(pass == (violations == 0L))
    }
    // the synthetic lineitem has duplicate (orderkey, linenumber) pairs
    // — the uniqueness rule must REPORT that, not mask it
    val unique = rows.find(_._1.startsWith("unique")).get
    assert(!unique._3 && unique._2 > 0L)
    assert(rows.count(_._3) >= 3, "the well-formed columns should pass")
    // one aggregation pass: a single scan feeds every rule (string
    // match — AQE wraps the physical nodes in this session, and its
    // toString repeats the initial plan, so trim to the final one)
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"rule suite must share one scan, got $scans:\n$plan")
  }

  test("corr_matrix: one scan, all pairs, |corr| <= 1, self-consistent with Spark's corr") {
    val df = RelationalQueries.corrMatrix(spark, sf)
    val rows = df.collect().map(r =>
      ((r.getString(0), r.getString(1)), r.getDouble(3))).toMap
    assert(rows.size == 6, "4 measures -> 6 unordered pairs")
    rows.values.foreach(c => assert(math.abs(c) <= 1.0 + 1e-9))
    // exact-DECIMAL moments must agree with Spark's own double corr to
    // well past the gated 4th decimal on this small slice
    val li = Tables(spark, sf, "lineitem")
    rows.foreach { case ((a, b), c) =>
      val want = li.stat.corr(a, b)
      assert(math.abs(c - want) < 5e-4, s"($a,$b): $c vs $want")
    }
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"all moments must come from one scan, got $scans")
  }

  // r14: quantile_bins' rank-arithmetic form vs the literal ntile
  // window — the rewrite must be (count, lo, hi)-identical for every
  // N mod 4, for N < 4, and when a run of equal prices straddles a bin
  // boundary (the case where naive percentile math goes wrong).
  test("quantile_bins rank arithmetic ≡ ntile window on crafted frames") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    def reference(li: org.apache.spark.sql.DataFrame) = {
      val w = Window.partitionBy($"l_returnflag").orderBy($"l_extendedprice")
      li.withColumn("bin", ntile(4).over(w))
        .groupBy($"l_returnflag", $"bin")
        .agg(count(lit(1)).as("n"),
          round(min($"l_extendedprice"), 4).as("lo"),
          round(max($"l_extendedprice"), 4).as("hi"))
        .orderBy($"l_returnflag", $"bin")
    }
    val cases = Seq(
      // (flag, prices): N mod 4 = 0,1,2,3; N < 4; boundary-straddling ties
      "A" -> Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0),
      "B" -> Seq(10.0, 20.0, 30.0, 40.0, 50.0),
      "C" -> Seq(5.0, 5.0, 5.0, 5.0, 5.0, 5.0),          // one giant tie
      "D" -> Seq(1.0, 2.0, 2.0, 2.0, 2.0, 3.0, 9.0),     // tie straddles bins
      "E" -> Seq(1.0, 2.0),                               // N < 4
      "F" -> (1 to 103).map(i => (i % 17).toDouble))      // ties everywhere
    val li = cases.flatMap { case (f, ps) => ps.map(p => (f, p)) }
      .toDF("l_returnflag", "l_extendedprice")
    val got = RelationalQueries.quantileBinsOn(li).collect().toSeq
    val want = reference(li).collect().toSeq
    assert(got == want, s"rank form diverged:\n got=$got\nwant=$want")
  }
}
