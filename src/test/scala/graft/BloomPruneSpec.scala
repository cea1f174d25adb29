package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FilterExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.operators.BloomPrune

class BloomPruneSpec extends AnyFunSuite with BeforeAndAfterAll {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("pruned probe keeps every true match and drops most non-matches") {
    import spark.implicits._
    val li = Tables(spark, sf, "lineitem")
    val urgent = Tables(spark, sf, "orders")
      .filter($"o_orderpriority" === "1-URGENT" &&
        $"o_orderdate" >= lit("2001-01-01").cast("timestamp"))
      .select($"o_orderkey")
    val pruned = BloomPrune.pruneByBloom(
      li, $"l_orderkey", urgent, $"o_orderkey", 100000L)
    val totalRows = li.count()
    val prunedRows = pruned.count()
    val trueMatches = li.join(urgent, $"l_orderkey" === $"o_orderkey").count()
    // superset of the true matches (bloom never drops a real key) …
    assert(pruned.join(urgent, $"l_orderkey" === $"o_orderkey").count() == trueMatches)
    // … and a real prune: the pass-through is near the true selectivity,
    // far under the full scan (fpp 3% default)
    assert(prunedRows >= trueMatches)
    assert(prunedRows < totalRows / 2,
      s"bloom pruned only $totalRows -> $prunedRows rows")
  }

  test("might_contain runs in the probe's scan stage, below the exchange") {
    // AQE wraps materialized stages in leaf QueryStageExec nodes that
    // hide their subtrees from collect(); the static plan shows the
    // full tree and the filter's position in it
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan = try {
      val df = BloomPrune.bloomPrune(spark, sf)
      df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    // find every shuffle; the bloom filter must appear BENEATH one (the
    // probe side's map stage), i.e. the prune happens before rows ship
    val underShuffle = plan.collect { case s: ShuffleExchangeExec =>
      s.collectFirst { case f: FilterExec
          if f.condition.exists(_.isInstanceOf[BloomFilterMightContain]) => f }
    }
    val anywhere = plan.collectFirst { case f: FilterExec
        if f.condition.exists(_.isInstanceOf[BloomFilterMightContain]) => f }
    assert(anywhere.nonEmpty, "plan lost the might_contain filter entirely")
    assert(underShuffle.flatten.nonEmpty || plan.collect {
      case s: ShuffleExchangeExec => s }.isEmpty,
      "might_contain must filter the probe before its shuffle")
  }

  test("bloom_prune equals the unpruned join bit for bit") {
    import spark.implicits._
    val got = BloomPrune.bloomPrune(spark, sf).collect().map(_.toSeq).toSeq
    val urgent = Tables(spark, sf, "orders")
      .filter($"o_orderpriority" === "1-URGENT" &&
        $"o_orderdate" >= lit("2001-01-01").cast("timestamp"))
      .select($"o_orderkey")
    val want = Tables(spark, sf, "lineitem")
      .join(urgent, $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n_lines"),
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 4).as("revenue"))
      .orderBy($"l_returnflag")
      .collect().map(_.toSeq).toSeq
    assert(got == want)
  }
}
