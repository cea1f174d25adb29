package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query: deterministic ORDER BY, aliased columns identical to the
  * DuckDB oracle, doubles rounded to 4 decimals on both sides (double
  * summation order differs between engines; see SURVEY.md §5).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    kmeans.KMeansQueries.queries ++
    operators.RelationalQueries.queries ++
    operators.TextAnalysis.queries ++
    operators.Dedup.queries ++
    operators.Similarity.queries ++
    operators.Multimodal.queries ++
    operators.AsOfJoin.queries ++
    operators.CorpusOps.queries ++
    operators.EventAnalytics.queries ++
    operators.BloomPrune.queries ++
    operators.Warehouse.queries ++
    operators.LangModel.queries ++
    operators.DataSelection.queries ++
    operators.EntityResolution.queries ++
    operators.TpchExtra.queries ++ Map(
    "q1_agg" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "lineitem")
        .filter($"l_shipdate" <= lit("1998-09-01").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          round(sum($"l_quantity"), 4).as("sum_qty"),
          // money sums: order-independent DECIMAL accumulation
          // (TpchExtra.moneySum) — plain double sums flip their 4th
          // decimal at sf10 group sizes by summation order alone
          round(operators.TpchExtra.moneySum($"l_extendedprice"), 4).as("sum_base_price"),
          round(operators.TpchExtra.moneySum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 4).as("sum_disc_price"),
          round(avg($"l_quantity"), 4).as("avg_qty"),
          round(avg($"l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }
  )

  /** Oracle applicability guards — consulted by [[Verify]] PER DATA
    * DIR: a query whose oracle models only one regime of an adaptive
    * plan (e.g. dedup_semantic's exact arm) returns Some(reason) in
    * the regime where the compare is designed to fail, and Verify then
    * omits its oracle (→ rows-only in the gate) and records the reason
    * in oracle_waivers.json. Guards must be CHEAP (one aggregate) —
    * they run inside every Verify invocation. */
  def oracleGuards: Map[String, (SparkSession, String) => Option[String]] =
    Map(
      "dedup_embedding" -> (operators.Dedup.embeddingOverCapReason(_, _)),
      "dedup_semantic" -> (operators.Dedup.semanticOverCapReason(_, _)))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    kmeans.KMeansQueries.oracles ++
    operators.RelationalQueries.oracles ++
    operators.TextAnalysis.oracles ++
    operators.Dedup.oracles ++
    operators.Similarity.oracles ++
    operators.Multimodal.oracles ++
    operators.AsOfJoin.oracles ++
    operators.CorpusOps.oracles ++
    operators.EventAnalytics.oracles ++
    operators.BloomPrune.oracles ++
    operators.Warehouse.oracles ++
    operators.LangModel.oracles ++
    operators.DataSelection.oracles ++
    operators.EntityResolution.oracles ++
    operators.TpchExtra.oracles ++ Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 4) AS sum_qty,
        |  round(CAST(sum(CAST(round(l_extendedprice, 4) AS DECIMAL(28,4))) AS DOUBLE), 4) AS sum_base_price,
        |  round(CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount), 4) AS DECIMAL(28,4))) AS DOUBLE), 4) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
