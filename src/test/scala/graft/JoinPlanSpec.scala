package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
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
