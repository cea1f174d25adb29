package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.operators.EventAnalytics

/** EventAnalytics invariants on sf0.001 (exact values are DuckDB-oracle-
  * checked via the driver contract; these are the structural laws). */
class EventAnalyticsSpec extends AnyFunSuite with BeforeAndAfterAll {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("funnel stages are monotonically non-increasing") {
    val r = EventAnalytics.funnel(spark, sf).head()
    val (viewed, clicked, purchased) =
      (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(viewed >= clicked && clicked >= purchased)
    assert(viewed > 0)
  }

  test("rollup grand total equals the sum of leaf rows") {
    val rows = EventAnalytics.rollupAgg(spark, sf).collect()
    val leaves = rows.filter(r =>
      r.getString(0) != "ALL" && r.getString(1) != "ALL")
    val total = rows.filter(r =>
      r.getString(0) == "ALL" && r.getString(1) == "ALL")
    assert(total.length == 1)
    assert(leaves.map(_.getLong(3)).sum == total.head.getLong(3))
  }

  test("pivot row sums equal daily event counts") {
    import org.apache.spark.sql.functions._
    val piv = EventAnalytics.pivotEvents(spark, sf)
    val pivTotal = piv.select(
      EventAnalytics.EventTypes.map(col).reduce(_ + _).as("rowsum"))
      .agg(sum("rowsum")).head().getLong(0)
    assert(pivTotal == Tables(spark, sf, "events").count())
  }
}
