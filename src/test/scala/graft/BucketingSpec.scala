package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Bucketing = the pre-shuffle (SURVEY.md §4 scale stance): tables
  * bucketed on the join key co-locate matching rows at WRITE time, so
  * the join plan has NO shuffle exchange on either side — at 100 TB this
  * turns every recurring fact⋈fact join on the same key from a full
  * network shuffle into a local zipper merge. */
class BucketingSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark: SparkSession = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir",
        Files.createTempDirectory("graft_warehouse").toString)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
      // AQE off: AdaptiveSparkPlanExec would hide the operators from
      // collect() and make the zero-shuffle assertion vacuously true
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  override def afterAll(): Unit = {
    spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
  }

  test("join of co-bucketed tables plans with zero shuffle exchanges") {
    val orders = Tables(spark, "/root/testdata/sf0.001", "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = Tables(spark, "/root/testdata/sf0.001", "lineitem")
      .select("l_orderkey", "l_quantity")
    orders.write.mode("overwrite")
      .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_b")
    lineitem.write.mode("overwrite")
      .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_b")
    val joined = spark.table("lineitem_b")
      .join(spark.table("orders_b"),
        spark.table("lineitem_b")("l_orderkey") === spark.table("orders_b")("o_orderkey"))
    val shuffles = joined.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }
    assert(shuffles.isEmpty,
      s"expected a shuffle-free co-located join, found ${shuffles.size} exchange(s)")
    // and it's still correct
    assert(joined.count() ==
      lineitem.join(orders,
        lineitem("l_orderkey") === orders("o_orderkey")).count())
  }
}
