package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.operators.RelationalQueries

/** Guards the 100-TB join stance of SURVEY.md §4: only genuinely small
  * dimensions (region, nation, supplier) may be broadcast. orders and
  * customer scale with the fact table — a forced broadcast of either is
  * an executor OOM at scale, so the plan must not contain one when the
  * planner is size-blind (autoBroadcastJoinThreshold = -1, AQE off: any
  * BroadcastExchange that remains comes from an explicit hint, exactly
  * the thing this spec polices — at real size estimates or under AQE the
  * planner may still legitimately broadcast a measured-small side). */
class JoinPlanSpec extends AnyFunSuite with BeforeAndAfterAll {
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
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  override def afterAll(): Unit = {
    spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
  }

  /** Column-name prefixes of the tables scanned beneath each broadcast
    * exchange of the plan. */
  private def broadcastScanPrefixes(df: DataFrame): Seq[Set[String]] = {
    df.queryExecution.executedPlan.collect {
      case b: BroadcastExchangeExec =>
        b.collect { case s: FileSourceScanExec =>
          s.schema.fieldNames.map(_.takeWhile(_ != '_') + "_").toSet
        }.flatten.toSet
    }
  }

  test("q3 broadcasts neither orders nor customer") {
    val bs = broadcastScanPrefixes(RelationalQueries.q3(spark, sf))
    assert(bs.isEmpty,
      s"q3 must not force any broadcast (fact-sized sides only); found $bs")
  }

  test("q5 broadcasts exactly the small dims, never orders/customer") {
    val bs = broadcastScanPrefixes(RelationalQueries.q5(spark, sf))
    val banned = Set("o_", "c_", "l_")
    assert(bs.nonEmpty, "q5 should still broadcast region/nation/supplier")
    bs.foreach { prefixes =>
      assert(prefixes.intersect(banned).isEmpty,
        s"fact-sized table under a BroadcastExchange: $prefixes")
      assert(prefixes.subsetOf(Set("r_", "n_", "s_")),
        s"unexpected broadcast side: $prefixes")
    }
  }

  /** Synthetic mini-warehouse for the q13/q18/q22 shape tests — the
    * oracle gates values on real data; these pin the semantics the real
    * data can't exercise (zero-order customers, churned customers). */
  private def miniWarehouse(): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_mini").toString
    Seq(
      (1L, "c1", 0L, 100.0, "SEG_A"), (2L, "c2", 0L, 900.0, "SEG_A"),
      (3L, "c3", 0L, 800.0, "SEG_B"), (4L, "c4", 0L, 50.0, "SEG_B"),
      (5L, "c5", 0L, 700.0, "SEG_B"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.parquet(s"$dir/customer.parquet")
    // customer 1: 3 orders (one recent); 2: 1 old order (churned, rich);
    // 3: 1 recent order; 4, 5: never ordered (5 is rich)
    Seq(
      (10L, 1L, "O", 10.0, "1996-05-01", "P"), (11L, 1L, "O", 10.0, "1997-05-01", "P"),
      (12L, 1L, "O", 10.0, "1999-05-01", "P"), (13L, 2L, "O", 10.0, "1998-05-01", "P"),
      (14L, 3L, "O", 10.0, "2000-05-01", "P"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "d", "o_orderpriority")
      .withColumn("o_orderdate", col("d").cast("timestamp")).drop("d")
      .write.parquet(s"$dir/orders.parquet")
    // order 10 crosses the 250-quantity threshold; 11 stays under
    Seq(
      (10L, 1L, 1L, 1, 200.0, 10.0, 0.0, 0.0, "N", "O", "1996-05-02"),
      (10L, 2L, 1L, 2, 60.0, 10.0, 0.0, 0.0, "N", "O", "1996-05-03"),
      (11L, 1L, 1L, 1, 249.0, 10.0, 0.0, 0.0, "N", "O", "1997-05-02"))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "d")
      .withColumn("l_shipdate", col("d").cast("timestamp")).drop("d")
      .write.parquet(s"$dir/lineitem.parquet")
    dir
  }

  test("q13 outer join keeps zero-order customers in the 0 bucket") {
    val dir = miniWarehouse()
    val rows = RelationalQueries.q13(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // buckets: 3 orders → {c1}, 1 order → {c2, c3}, 0 orders → {c4, c5};
    // ordered custdist DESC, c_count DESC
    assert(rows == Seq((1L, 2L), (0L, 2L), (3L, 1L)),
      s"zero-order customers must survive the outer join; got $rows")
  }

  test("q13/q22 never broadcast a fact-sized scan; q22's broadcast is the 1-row scalar") {
    val q13bs = broadcastScanPrefixes(RelationalQueries.q13(spark, sf))
    assert(q13bs.isEmpty, s"q13 must not force a broadcast; found $q13bs")
    // q22's only broadcast is the scalar avg aggregate — every broadcast
    // subtree must sit above an aggregation, never a raw table scan
    val plan = RelationalQueries.q22(spark, sf).queryExecution.executedPlan
    val raw = plan.collect { case b: BroadcastExchangeExec
        if b.collectFirst { case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a }.isEmpty =>
      b
    }
    assert(raw.isEmpty, "q22 broadcast must be the aggregated scalar, not a raw scan")
  }

  test("q18 reports only orders whose line quantity crosses the threshold") {
    val dir = miniWarehouse()
    val rows = RelationalQueries.q18(spark, dir).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(10L), "only order 10 sums past 250")
    assert(rows.head.getDouble(3) == 260.0)
  }

  test("q22 keeps exactly the churned above-average customers") {
    val dir = miniWarehouse()
    // avg positive balance = (100+900+800+50+700)/5 = 510; above: 2, 3, 5.
    // recent (≥1999) orderers: 1, 3 → churned rich = {2 (SEG_A), 5 (SEG_B)}
    val rows = RelationalQueries.q22(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rows == Seq(("SEG_A", 1L, 900.0), ("SEG_B", 1L, 700.0)), s"got $rows")
  }

  test("q3/q5 stay value-correct without the fact broadcasts") {
    // same queries under the size-blind planner (shuffle joins) and the
    // default planner (broadcasts where small) must return identical
    // rows — the hint removal changed only the physical plan
    val q3 = RelationalQueries.q3(spark, sf).collect().map(_.toSeq).toSeq
    val q5 = RelationalQueries.q5(spark, sf).collect().map(_.toSeq).toSeq
    assert(q3.length == 10 && q5.nonEmpty)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 10L * 1024 * 1024)
    try {
      val q3b = RelationalQueries.q3(spark, sf).collect().map(_.toSeq).toSeq
      val q5b = RelationalQueries.q5(spark, sf).collect().map(_.toSeq).toSeq
      assert(q3 == q3b, "q3 rows must not depend on the join strategy")
      assert(q5 == q5b, "q5 rows must not depend on the join strategy")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
  }
}
