package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.operators.TpchExtra

/** The TPC-H completeness wave (SURVEY §2.B): value sanity at sf0.001
  * plus the scale-stance plan assertions — q6 must be a join-free
  * pushed-filter scan-agg, and no query may hint-broadcast a fact-scaled
  * side (part, orders, customer) under a size-blind planner. */
class TpchExtraSpec extends AnyFunSuite with BeforeAndAfterAll {
  private val sf = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      // at-scale plan regime: the narrow-scan spread is a no-op on
      // real (row-group-parallel) tables — see PlanShapeSpec note
      .config("spark.graft.spreadNarrowScans", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  override def afterAll(): Unit = {
    spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
  }

  private def broadcastScanPrefixes(df: DataFrame): Set[String] =
    df.queryExecution.executedPlan.collect {
      case b: BroadcastExchangeExec =>
        b.collect { case s: FileSourceScanExec =>
          s.schema.fieldNames.map(_.takeWhile(_ != '_') + "_").toSet
        }.flatten.toSet
    }.flatten.toSet

  test("q6 is a join-free scan-agg with every predicate pushed") {
    val df = TpchExtra.q6(spark, sf)
    val plan = df.queryExecution.executedPlan
    val scans = plan.collect { case s: FileSourceScanExec => s }
    assert(scans.size == 1, s"q6 must read exactly one table; got ${scans.size}")
    val pushed = scans.head.metadata.getOrElse("PushedFilters", "")
    for (col <- Seq("l_shipdate", "l_discount", "l_quantity"))
      assert(pushed.contains(col), s"q6 predicate on $col not pushed: $pushed")
    // single-row global agg: the only exchange allowed is the 1-partition
    // final-agg gather, never a join shuffle
    assert(plan.collect { case e: ShuffleExchangeExec => e }.size <= 1,
      "q6 must not shuffle beyond the final-agg gather")
    val r = df.collect()
    assert(r.length == 1 && r.head.getDouble(0) > 0, "q6 revenue must be positive")
  }

  test("no query hint-broadcasts a fact-scaled side (part/orders/customer)") {
    for ((name, fn) <- TpchExtra.queries) {
      val bs = broadcastScanPrefixes(fn(spark, sf))
      val bad = bs.intersect(Set("p_", "o_", "c_", "l_"))
      assert(bad.isEmpty, s"$name broadcasts a fact-scaled side: $bad")
    }
  }

  test("q14 promo share is a percentage strictly inside (0, 100)") {
    val v = TpchExtra.q14(spark, sf).collect().head.getDouble(0)
    assert(v > 0 && v < 100, s"promo share out of range: $v")
  }

  test("q8 market shares are fractions in [0, 1] for both years") {
    val rows = TpchExtra.q8(spark, sf).collect()
    assert(rows.length == 2, s"expected order years 1996+1997, got ${rows.length}")
    rows.foreach { r =>
      val share = r.getDouble(1)
      assert(share >= 0 && share <= 1, s"share out of range: $r")
    }
  }

  test("q15 returns exactly the argmax supplier of the quarterly revenue") {
    import spark.implicits._
    val top = TpchExtra.q15(spark, sf).collect().head
    // independent fold: per-supplier revenue, max by (rev, -suppkey)
    val rev = Tables(spark, sf, "lineitem")
      .filter($"l_shipdate" >= org.apache.spark.sql.functions.lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < org.apache.spark.sql.functions.lit("1996-04-01").cast("timestamp"))
      .groupBy($"l_suppkey")
      .agg(org.apache.spark.sql.functions.sum($"l_extendedprice" * (org.apache.spark.sql.functions.lit(1.0) - $"l_discount")).as("rev"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val best = rev.minBy { case (k, v) => (-v, k) }
    assert(top.getLong(0) == best._1, s"q15 picked ${top.getLong(0)}, expected ${best._1}")
  }

  test("q17 small-quantity revenue is positive and below the brand total") {
    import spark.implicits._
    val small = TpchExtra.q17(spark, sf).collect().head.getDouble(0)
    val total = Tables(spark, sf, "lineitem")
      .join(Tables(spark, sf, "part").filter($"p_brand" === "Brand#23").select("p_partkey"),
        $"l_partkey" === $"p_partkey")
      .agg(org.apache.spark.sql.functions.sum($"l_extendedprice")).collect().head.getDouble(0) / 7.0
    assert(small > 0 && small < total, s"q17 out of range: $small vs $total")
  }

  test("q7 emits only legal nation-pair directions, at least one") {
    // the QUERY admits both directions; which ones materialize depends
    // on the synthetic data (sf0.001 happens to produce one) — assert
    // the direction set is a non-empty subset of the legal pairs
    // instead of over-asserting on data this spec doesn't control
    val rows = TpchExtra.q7(spark, sf).collect()
    val dirs = rows.map(r => (r.getString(0), r.getString(1))).toSet
    val legal = Set(("NATION_3", "NATION_7"), ("NATION_7", "NATION_3"))
    assert(dirs.nonEmpty && dirs.subsetOf(legal), s"q7 directions: $dirs")
  }
}
