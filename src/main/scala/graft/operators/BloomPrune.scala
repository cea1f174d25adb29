package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftShims, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import graft.Tables

/** Manual bloom-filter runtime pruning — the scan-side join filter that
  * decides a 100-TB shuffle join's cost. Spark's own InjectRuntimeFilter
  * applies this rewrite only under narrow heuristics (creation-side size
  * caps, no AQE interplay, one filter per join); this operator is the
  * same construction as an explicit, composable building block: build a
  * bloom filter over the small side's join keys (one scalar-subquery
  * aggregation — `O(numBits)` state, associative merge, never a
  * driver-side collect), AND the `might_contain` probe into the big
  * side's scan stage, then run the exact join to kill the bloom's false
  * positives. The result is bit-identical to the unpruned join (the
  * bloom can only pass extra rows, never drop a true match), so the
  * DuckDB oracle runs the plain semi-join — while the Spark plan ships
  * only `fpp + selectivity` of the probe table into the exchange
  * instead of all of it.
  *
  * Both sides hash with Spark's `XxHash64` — engine-local by design:
  * the bloom never appears in the output, so oracle portability (which
  * bans non-portable hashes in RESULTS, SURVEY §5) is untouched.
  */
object BloomPrune {

  /** `probe` minus the rows whose `probeKey` is provably absent from
    * `build`'s `buildKey` set: `might_contain(bloom(build.key),
    * xxhash64(probe.key))` as a scan-stage filter. Keeps false
    * positives (callers follow with the exact join); drops nothing
    * that joins. `expectedItems` sizes the filter (~1.2 KB per 1k keys
    * at the default 3% fpp). */
  def pruneByBloom(probe: DataFrame, probeKey: Column,
                   build: DataFrame, buildKey: Column,
                   expectedItems: Long): DataFrame = {
    val bloomAgg = GraftShims.column(
      new BloomFilterAggregate(
        new XxHash64(Seq(GraftShims.expression(buildKey))), expectedItems)
        .toAggregateExpression())
    val bloom = build.agg(bloomAgg.as("bf")).scalar()
    val mightContain = GraftShims.column(
      BloomFilterMightContain(
        GraftShims.expression(bloom),
        new XxHash64(Seq(GraftShims.expression(probeKey)))))
    probe.filter(mightContain)
  }

  /** Revenue of lineitems belonging to recent urgent orders: the
    * urgent-order keys (~1.5% of orders) become a bloom filter pruning
    * the lineitem scan BEFORE the join's exchange; the exact join then
    * drops the ~fpp false passes. Oracle = the plain join (identical
    * result by construction). */
  def bloomPrune(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val urgent = Tables(s, dir, "orders")
      .filter($"o_orderpriority" === "1-URGENT" &&
        $"o_orderdate" >= lit("2001-01-01").cast("timestamp"))
      .select($"o_orderkey")
    val pruned = pruneByBloom(
      Tables(s, dir, "lineitem"), $"l_orderkey", urgent, $"o_orderkey",
      expectedItems = 100000L)
    pruned
      .join(urgent, $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n_lines"),
        // order-independent DECIMAL accumulation (TpchExtra.moneySum):
        // the plain double sum flipped its 10th digit at sf10 by
        // summation order alone — same class as q6/q17/q19
        round(TpchExtra.moneySum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 4)
          .as("revenue"))
      .orderBy($"l_returnflag")
  }

  val bloomPruneSql: String =
    s"""SELECT l_returnflag, count(*) AS n_lines,
      |  round(${TpchExtra.duckMoneySum("l_extendedprice * (1.0 - l_discount)")}, 4) AS revenue
      |FROM lineitem
      |JOIN (SELECT o_orderkey FROM orders
      |      WHERE o_orderpriority = '1-URGENT'
      |        AND o_orderdate >= TIMESTAMP '2001-01-01') urgent
      |  ON l_orderkey = o_orderkey
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bloom_prune" -> (bloomPrune(_, _)))

  def oracles: Map[String, String] = Map(
    "bloom_prune" -> bloomPruneSql)
}
