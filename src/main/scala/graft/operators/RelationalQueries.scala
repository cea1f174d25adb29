package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** SURVEY.md §2.B — the relational core: scans, broadcast star joins,
  * windowed ranking, sessionization, windowed event aggregation. These
  * exercise the same loader/shuffle/aggregate machinery the K-Means path
  * uses, as plain queries.
  *
  * Scale notes (100 TB stance): only the genuinely small dimension sides
  * (region, nation, supplier) carry a `broadcast()` hint. orders and
  * customer SCALE WITH THE FACT TABLE (orders ≈ ¼ of lineitem rows) — a
  * forced broadcast of either is terabytes at 100 TB and an executor OOM,
  * so those legs are left to the planner: shuffle hash/sort-merge join at
  * scale, with AQE free to pick a broadcast at runtime when the measured
  * side is actually small. JoinPlanSpec asserts no broadcast on the
  * fact-sized legs under a size-blind planner. Aggregations rely on
  * map-side partial agg; window functions partition by high-cardinality
  * keys (user_id, suppkey) so the sort is per-group, not global.
  * Timestamps are truncated to seconds in both engines (parquet stores
  * ns; Spark reads µs — second truncation makes the oracle comparison
  * precision-proof).
  */
object RelationalQueries {

  def q3(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val customer = Tables(s, dir, "customer").filter($"c_mktsegment" === "BUILDING")
    val orders = Tables(s, dir, "orders")
      .filter($"o_orderdate" < lit("1996-01-01").cast("timestamp"))
    val lineitem = Tables(s, dir, "lineitem")
      .filter($"l_shipdate" > lit("1996-01-01").cast("timestamp"))
    lineitem
      .join(orders, $"l_orderkey" === $"o_orderkey")
      .join(customer, $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
      .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 4).as("revenue"))
      .orderBy($"revenue".desc, $"l_orderkey")
      .limit(10)
  }

  val q3Sql: String =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1996-01-01'
      |  AND l_shipdate > TIMESTAMP '1996-01-01'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  def q5(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val region = Tables(s, dir, "region").filter($"r_name" === "ASIA")
    val nation = Tables(s, dir, "nation")
    val customer = Tables(s, dir, "customer")
    val supplier = Tables(s, dir, "supplier")
    val orders = Tables(s, dir, "orders")
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1998-01-01").cast("timestamp"))
    val lineitem = Tables(s, dir, "lineitem")
    lineitem
      .join(orders.select("o_orderkey", "o_custkey"), $"l_orderkey" === $"o_orderkey")
      .join(customer.select("c_custkey", "c_nationkey"), $"o_custkey" === $"c_custkey")
      .join(broadcast(supplier.select("s_suppkey", "s_nationkey")),
        $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(nation), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
      .groupBy($"n_name")
      .agg(round(TpchExtra.moneySum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 4)
        .as("revenue"))
      .orderBy($"revenue".desc, $"n_name")
  }

  val q5Sql: String =
    s"""SELECT n_name,
      |  round(${TpchExtra.duckMoneySum("l_extendedprice * (1.0 - l_discount)")}, 4) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** Per-supplier top-3 parts by revenue — windowed ranking. */
  def topkWindow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rev = Tables(s, dir, "lineitem")
      .groupBy($"l_suppkey", $"l_partkey")
      .agg(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("rev"))
    val w = Window.partitionBy($"l_suppkey").orderBy($"rev".desc, $"l_partkey")
    rev.withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3)
      .select($"l_suppkey", $"l_partkey", round($"rev", 4).as("revenue"), $"rk")
      .orderBy($"l_suppkey", $"rk")
  }

  val topkWindowSql: String =
    """WITH rev AS (
      |  SELECT l_suppkey, l_partkey,
      |    sum(l_extendedprice * (1.0 - l_discount)) AS rev
      |  FROM lineitem GROUP BY l_suppkey, l_partkey),
      |ranked AS (
      |  SELECT l_suppkey, l_partkey, rev,
      |    CAST(row_number() OVER (PARTITION BY l_suppkey
      |      ORDER BY rev DESC, l_partkey) AS INT) AS rk
      |  FROM rev)
      |SELECT l_suppkey, l_partkey, round(rev, 4) AS revenue, rk
      |FROM ranked WHERE rk <= 3
      |ORDER BY l_suppkey, rk""".stripMargin

  /** Order-count distribution per customer (TPC-H Q13's shape) — the
    * suite's OUTER-join exercise: customers with zero orders must
    * survive into the 0-bucket, which an inner join silently drops.
    *
    * Scale: the textbook form left-outer-joins raw orders onto
    * customer and counts after the join, shuffling every order row.
    * Here orders pre-aggregate to one (custkey, count) row BEFORE the
    * join — the join input shrinks from |orders| to |customers| and
    * the outer join matches at most one row per customer. Identical
    * result (a missing group ≡ count 0 via coalesce). */
  def q13(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val perCust = Tables(s, dir, "orders")
      .groupBy($"o_custkey").agg(count(lit(1)).as("n_orders"))
    Tables(s, dir, "customer").select($"c_custkey")
      .join(perCust, $"c_custkey" === $"o_custkey", "left_outer")
      .select(coalesce($"n_orders", lit(0L)).as("c_count"))
      .groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy($"custdist".desc, $"c_count".desc)
  }

  val q13Sql: String =
    """WITH per_cust AS (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      |  GROUP BY c_custkey)
      |SELECT c_count, count(*) AS custdist
      |FROM per_cust GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** Large-order report (TPC-H Q18's shape): orders whose total line
    * quantity exceeds a threshold — a HAVING filter on a fact-side
    * aggregation joined back to the order header. The aggregation
    * runs FIRST and the threshold prunes it to a tiny key set, so the
    * join-back sees ~1% of orders; AQE is free to broadcast the
    * surviving keys at runtime (the plan never materializes an
    * unfiltered orders × lineitem join). */
  def q18(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val big = Tables(s, dir, "lineitem")
      .groupBy($"l_orderkey")
      .agg(round(sum($"l_quantity"), 4).as("sum_qty"))
      .filter($"sum_qty" > 250.0)
    Tables(s, dir, "orders")
      .join(big, $"o_orderkey" === $"l_orderkey")
      .select($"o_orderkey", $"o_orderdate", round($"o_totalprice", 4).as("o_totalprice"),
        $"sum_qty")
      .orderBy($"sum_qty".desc, $"o_orderkey")
      .limit(100)
  }

  val q18Sql: String =
    """SELECT o_orderkey, o_orderdate, round(o_totalprice, 4) AS o_totalprice,
      |  sum_qty
      |FROM orders
      |JOIN (SELECT l_orderkey, round(sum(l_quantity), 4) AS sum_qty
      |      FROM lineitem GROUP BY l_orderkey
      |      HAVING round(sum(l_quantity), 4) > 250.0) big
      |  ON o_orderkey = l_orderkey
      |ORDER BY sum_qty DESC, o_orderkey
      |LIMIT 100""".stripMargin

  /** Churned-rich customers (TPC-H Q22's shape): above-average-balance
    * customers with NO order since 1999 — a scalar AGGREGATE subquery
    * (the global positive-balance mean) plus an anti-join. The scalar
    * is a 1-row broadcast onto the customer scan; the anti side
    * filters orders to the recent window and projects to DISTINCT
    * custkeys first, so the anti-join probes a recently-active-
    * customer-sized key set instead of every order row. (The classic
    * "never ordered" predicate is empty on this synthetic data —
    * every customer has an order — so the recency cutoff is what
    * makes the anti-join carry weight.) */
  def q22(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val avgBal = Tables(s, dir, "customer")
      .filter($"c_acctbal" > 0.0)
      .agg(avg($"c_acctbal").as("avg_bal"))
    val recentlyActive = Tables(s, dir, "orders")
      .filter($"o_orderdate" >= lit("1999-01-01").cast("timestamp"))
      .select($"o_custkey").distinct()
    Tables(s, dir, "customer")
      .crossJoin(broadcast(avgBal))
      .filter($"c_acctbal" > $"avg_bal")
      .join(recentlyActive, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("numcust"),
        round(TpchExtra.moneySum($"c_acctbal"), 4).as("totacctbal"))
      .orderBy($"c_mktsegment")
  }

  val q22Sql: String =
    s"""SELECT c_mktsegment, count(*) AS numcust,
      |  round(${TpchExtra.duckMoneySum("c_acctbal")}, 4) AS totacctbal
      |FROM customer
      |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
      |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |    AND o_orderdate >= TIMESTAMP '1999-01-01')
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  /** Session-gap threshold (seconds) shared by [[sessionize]] and
    * [[EventAnalytics.eventPaths]]. */
  val SessionGapSec = 1800L

  /** Attach a per-user `sess_id` column (30-min inactivity gap rule:
    * lag + running sum of session starts) to an event frame carrying
    * (user_id, ts, event_id). ONE definition of "session" — the
    * session-stats operator and the path-analysis operator must agree
    * on where a session breaks, and the DuckDB twins reproduce the
    * identical window fold. One shuffle on user_id; the window sort is
    * per-user and spillable. */
  def withSessionIds(ev: DataFrame): DataFrame = {
    import ev.sparkSession.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    ev
      .withColumn("prev_ts", lag($"ts", 1).over(byUser))
      .withColumn("new_sess",
        when($"prev_ts".isNull ||
          unix_timestamp($"ts") - unix_timestamp($"prev_ts") > SessionGapSec,
          1L).otherwise(0L))
      .withColumn("sess_id", sum($"new_sess").over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("prev_ts", "new_sess")
  }

  /** The DuckDB twin of [[withSessionIds]]: CTE text producing `sess`
    * (all of `ev`'s columns + sess_id) from a CTE named `ev`. `cmp`
    * is the gap comparison; the default ">" (exact-gap stays
    * in-session) is the rule BOTH the lag form and Spark's
    * `session_window` merge implement — verified at sf0.1's exact-gap
    * boundary, see [[sessionizeNative]]. */
  def withSessionIdsSql(evCols: String, cmp: String = ">"): String =
    s"""flagged AS (
       |  SELECT $evCols,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |           OR date_diff('second', lag(ts) OVER w, ts) $cmp $SessionGapSec
       |         THEN 1 ELSE 0 END AS new_sess
       |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |sess AS (
       |  SELECT $evCols,
       |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS UNBOUNDED PRECEDING) AS sess_id
       |  FROM flagged)""".stripMargin

  /** Sessionization: 30-min inactivity gap, per-user session stats.
    * lag + running sum of session starts — one shuffle on user_id. */
  def sessionize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables(s, dir, "events")
      .select($"user_id", date_trunc("second", $"ts").as("ts"), $"event_id")
    val sessions = withSessionIds(ev)
      .groupBy($"user_id", $"sess_id")
      .agg(count(lit(1)).as("n_events"),
        (unix_timestamp(max($"ts")) - unix_timestamp(min($"ts"))).as("dur_sec"))
    sessions.groupBy($"user_id")
      .agg(count(lit(1)).as("n_sessions"),
        sum($"n_events").as("n_events"),
        max($"dur_sec").as("max_dur_sec"),
        round(avg($"n_events"), 4).as("avg_events_per_session"))
      .orderBy($"user_id")
  }

  val sessionizeSql: String =
    s"""WITH ev AS (
      |  SELECT user_id, date_trunc('second', ts) AS ts, event_id FROM events),
      |${withSessionIdsSql("user_id, ts, event_id")},
      |per_sess AS (
      |  SELECT user_id, sess_id, count(*) AS n_events,
      |    date_diff('second', min(ts), max(ts)) AS dur_sec
      |  FROM sess GROUP BY user_id, sess_id)
      |SELECT user_id, count(*) AS n_sessions,
      |  CAST(sum(n_events) AS BIGINT) AS n_events,
      |  max(dur_sec) AS max_dur_sec,
      |  round(avg(n_events), 4) AS avg_events_per_session
      |FROM per_sess GROUP BY user_id ORDER BY user_id""".stripMargin

  /** The Catalyst-NATIVE sessionization: `session_window(ts, gap)` as
    * the grouping key instead of the hand-rolled lag/cumsum window —
    * the "declare it and let Catalyst pick the physical strategy"
    * form (one `SessionWindow` aggregation, merging sessions inside
    * the aggregate's buffer; no analytic-window sort pass, and the
    * SAME operator runs unchanged over a watermarked stream).
    *
    * Boundary semantics VERIFIED, not assumed: at a gap of exactly
    * 1800 s Spark MERGES (an event starting at the previous window's
    * end joins the session — measured against sf0.1's one exact-gap
    * user, 56 sessions not 57), which is precisely [[sessionize]]'s
    * lag rule `diff > 1800` — so both operators share one session
    * definition and the SAME oracle fold; a future divergence at the
    * boundary breaks the hash gate. */
  def sessionizeNative(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables(s, dir, "events")
      .select($"user_id", date_trunc("second", $"ts").as("ts"))
    val sessions = ev
      .groupBy($"user_id", session_window($"ts", s"$SessionGapSec seconds"))
      .agg(count(lit(1)).as("n_events"),
        (unix_timestamp(max($"ts")) - unix_timestamp(min($"ts"))).as("dur_sec"))
    sessions.groupBy($"user_id")
      .agg(count(lit(1)).as("n_sessions"),
        sum($"n_events").as("n_events"),
        max($"dur_sec").as("max_dur_sec"),
        round(avg($"n_events"), 4).as("avg_events_per_session"))
      .orderBy($"user_id")
  }

  val sessionizeNativeSql: String =
    s"""WITH ev AS (
      |  SELECT user_id, date_trunc('second', ts) AS ts, event_id FROM events),
      |${withSessionIdsSql("user_id, ts, event_id")},
      |per_sess AS (
      |  SELECT user_id, sess_id, count(*) AS n_events,
      |    date_diff('second', min(ts), max(ts)) AS dur_sec
      |  FROM sess GROUP BY user_id, sess_id)
      |SELECT user_id, count(*) AS n_sessions,
      |  CAST(sum(n_events) AS BIGINT) AS n_events,
      |  max(dur_sec) AS max_dur_sec,
      |  round(avg(n_events), 4) AS avg_events_per_session
      |FROM per_sess GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Tumbling 1-day windowed aggregation — the batch twin of the
    * Structured Streaming query in graft.streaming (same plan shape). */
  def windowAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "events")
      .groupBy(window($"ts", "1 day").getField("start").as("window_start"),
        $"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 4).as("sum_value"))
      .orderBy($"window_start", $"event_type")
  }

  val windowAggSql: String =
    """SELECT date_trunc('day', ts) AS window_start, event_type,
      |  count(*) AS n, round(sum(value), 4) AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY window_start, event_type""".stripMargin

  /** Data profiling (the ANALYZE side of an engine): per-column
    * min/max/null-count/distinct-count for the core lineitem measures,
    * one row per column. One aggregation pass computes every statistic;
    * the unpivot is a zero-shuffle projection of the 1-row result. */
  def profileTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
    val li = Tables(s, dir, "lineitem")
    val aggs = cols.flatMap(c => Seq(
      round(min(col(c)), 4).as(s"${c}_min"),
      round(max(col(c)), 4).as(s"${c}_max"),
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"),
      count_distinct(col(c)).as(s"${c}_distinct")))
    val one = li.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map(c =>
      s"'$c', ${c}_min, ${c}_max, ${c}_nulls, ${c}_distinct").mkString(", ")
    one.select(expr(
        s"stack(${cols.size}, $stacked) AS (col_name, min_val, max_val, n_nulls, n_distinct)"))
      .orderBy($"col_name")
  }

  /** The 100-TB profiling path: same single-pass plan shape as
    * [[profileTable]], with each exact `count_distinct` (which shuffles
    * every distinct value of every profiled column) replaced by
    * `approx_count_distinct`'s HLL++ sketch — O(sketch-size) aggregation
    * state per column per partition, merged associatively map-side, so
    * the profile costs one scan plus K sketch merges at any corpus
    * size. rows-only (sketch estimates are engine-specific);
    * ApproxDistinctSpec bounds the relative error against the exact
    * twin. */
  def profileTableApprox(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
    val li = Tables(s, dir, "lineitem")
    val aggs = cols.flatMap(c => Seq(
      round(min(col(c)), 4).as(s"${c}_min"),
      round(max(col(c)), 4).as(s"${c}_max"),
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"),
      approx_count_distinct(col(c)).as(s"${c}_distinct")))
    val one = li.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map(c =>
      s"'$c', ${c}_min, ${c}_max, ${c}_nulls, ${c}_distinct").mkString(", ")
    one.select(expr(
        s"stack(${cols.size}, $stacked) AS (col_name, min_val, max_val, n_nulls, n_distinct)"))
      .orderBy($"col_name")
  }

  val profileTableSql: String = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
    cols.map(c =>
      s"""SELECT '$c' AS col_name, round(min($c), 4) AS min_val,
         |  round(max($c), 4) AS max_val,
         |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         |  count(DISTINCT $c) AS n_distinct FROM lineitem""".stripMargin)
      .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  /** Columns profiled by [[corrMatrix]]. */
  private val CorrCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  /** Pairwise Pearson correlation matrix over the lineitem measures —
    * the feature-correlation screen a data-quality/feature-selection
    * pass runs before model training. ONE scan computes every moment
    * (n, Σx, Σx², Σxy for all 6 pairs) in a single aggregate with
    * map-side partials; the 1-row result fans out to pair rows
    * in-plan (`explode` of a struct array, no re-scan per pair).
    *
    * Parity discipline: global double sums are order-dependent (the
    * round-10 sf1 q19 lesson — see [[TpchExtra.moneySum]]), so every
    * moment accumulates EXACTLY: each input becomes its integer
    * ten-thousandths ([[graft.functions.Money4Bits]] — the measures are
    * ≤ 2-decimal values, so the scaling is exact), squares/products are
    * exact LONG multiplies (≤ 9.2e10² units, inside int64), and the
    * sums run in [[graft.functions.MoneySum]]'s 128-bit primitive
    * buffer — associative, hence bit-stable under any partitioning at
    * any scale, and allocation-free where the round-10 DECIMAL(38,8)
    * moments boxed two BigDecimals per row per moment (2.0 s at sf0.1
    * → this form benches ~0.9 s). The oracle's DECIMAL fold computes
    * the same exact rationals. The correlation itself is then a fixed
    * double formula over exact sums, written with the same association
    * in both engines. */
  def corrMatrix(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables(s, dir, "lineitem")
    import graft.functions.{Money4Bits, MoneySum}
    def b(c: String) = Money4Bits(col(c))
    val moments =
      Seq(count(lit(1)).as("n")) ++
      CorrCols.map(c => MoneySum.ofBits(b(c), 4).as(s"s_$c")) ++
      CorrCols.map(c => MoneySum.ofBits(b(c) * b(c), 8).as(s"q_$c")) ++
      pairs.map { case (a, b2) =>
        MoneySum.ofBits(b(a) * b(b2), 8).as(s"p_${a}_${b2}") }
    val one = li.agg(moments.head, moments.tail: _*)
    val nD = $"n".cast("double")
    def corrOf(a: String, b: String): Column = {
      val (sx, sy) = (col(s"s_$a").cast("double"), col(s"s_$b").cast("double"))
      val (qx, qy) = (col(s"q_$a").cast("double"), col(s"q_$b").cast("double"))
      val sp = col(s"p_${a}_${b}").cast("double")
      (nD * sp - sx * sy) /
        (sqrt(nD * qx - sx * sx) * sqrt(nD * qy - sy * sy))
    }
    val pairStructs = pairs.map { case (a, b) =>
      struct(lit(a).as("col_x"), lit(b).as("col_y"),
        round(corrOf(a, b), 4).as("corr"))
    }
    one.select($"n", explode(array(pairStructs: _*)).as("pr"))
      .select($"pr.col_x".as("col_x"), $"pr.col_y".as("col_y"),
        $"n", $"pr.corr".as("corr"))
      .orderBy($"col_x", $"col_y")
  }

  private def pairs: Seq[(String, String)] =
    for {
      (a, i) <- CorrCols.zipWithIndex
      b <- CorrCols.drop(i + 1)
    } yield (a, b)

  val corrMatrixSql: String = {
    def d(c: String) = s"CAST(round($c, 4) AS DECIMAL(12,4))"
    // one WIDE operand per product: DuckDB multiplies two DECIMAL(12,4)s
    // in their int64 physical type and overflows on ~1e5-magnitude
    // values; (24,4)×(12,4) binds an int128 product (36,8) — exact, and
    // equal to Spark's (12,4)×(12,4)→(25,8)
    def dw(c: String) = s"CAST(round($c, 4) AS DECIMAL(24,4))"
    val momentSelects =
      (Seq("count(*) AS n") ++
        CorrCols.map(c => s"sum(${d(c)}) AS s_$c") ++
        CorrCols.map(c => s"sum(${dw(c)} * ${d(c)}) AS q_$c") ++
        pairs.map { case (a, b) => s"sum(${dw(a)} * ${d(b)}) AS p_${a}_${b}" })
        .mkString(",\n    ")
    val pairSelects = pairs.map { case (a, b) =>
      s"""SELECT '$a' AS col_x, '$b' AS col_y, n,
         |  round((CAST(n AS DOUBLE) * CAST(p_${a}_${b} AS DOUBLE)
         |      - CAST(s_$a AS DOUBLE) * CAST(s_$b AS DOUBLE))
         |    / (sqrt(CAST(n AS DOUBLE) * CAST(q_$a AS DOUBLE)
         |        - CAST(s_$a AS DOUBLE) * CAST(s_$a AS DOUBLE))
         |      * sqrt(CAST(n AS DOUBLE) * CAST(q_$b AS DOUBLE)
         |        - CAST(s_$b AS DOUBLE) * CAST(s_$b AS DOUBLE))), 4) AS corr
         |FROM m""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH m AS (
       |  SELECT $momentSelects
       |  FROM lineitem)
       |$pairSelects
       |ORDER BY col_x, col_y""".stripMargin
  }

  val HistBins = 10

  /** Equi-width histogram of l_extendedprice (the ANALYZE companion of
    * [[profileTable]]): bounds from one aggregation, broadcast onto the
    * binning scan (no driver collect — the plan stays declarative), one
    * group-by on ≤ [[HistBins]] integer keys with map-side partials.
    * Binning arithmetic is identical IEEE double ops on both engines,
    * so the integer bin of every row — and therefore the oracle hash —
    * is bit-deterministic. A constant column (hi = lo) would make the
    * bin width 0 and the bin expression 0.0/0.0 = NaN, where the two
    * engines' floor/cast NaN semantics diverge — both sides guard it
    * to bin 0 explicitly with the same CASE. */
  def histogram(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val x = Tables(s, dir, "lineitem").select($"l_extendedprice".as("x"))
    val bounds = x.agg(min($"x").as("lo"), max($"x").as("hi"))
    x.crossJoin(broadcast(bounds))
      .withColumn("w", ($"hi" - $"lo") / HistBins)
      .withColumn("bin",
        when($"hi" === $"lo", lit(0L))
          .otherwise(least(floor(($"x" - $"lo") / $"w"), lit(HistBins - 1L)))
          .cast("int"))
      .groupBy($"bin")
      .agg(count(lit(1)).as("n"), min($"lo").as("lo"), min($"w").as("w"))
      .select($"bin",
        round($"lo" + $"bin" * $"w", 4).as("bin_lo"),
        round($"lo" + ($"bin" + 1) * $"w", 4).as("bin_hi"),
        $"n")
      .orderBy($"bin")
  }

  val histogramSql: String =
    s"""WITH b AS (
       |  SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
       |  FROM lineitem),
       |binned AS (
       |  SELECT CAST(CASE WHEN hi = lo THEN 0
       |    ELSE least(floor((l_extendedprice - lo) / ((hi - lo) / $HistBins)),
       |      ${HistBins - 1}) END AS INT) AS bin,
       |    lo, (hi - lo) / $HistBins AS w
       |  FROM lineitem CROSS JOIN b)
       |SELECT bin, round(lo + bin * w, 4) AS bin_lo,
       |  round(lo + (bin + 1) * w, 4) AS bin_hi, count(*) AS n
       |FROM binned GROUP BY bin, lo, w ORDER BY bin""".stripMargin

  /** Exact interpolated quantiles per group — Spark's `percentile` and
    * DuckDB's `quantile_cont` share the (n-1)·p linear-interpolation
    * definition, so the values are oracle-checkable to 4 decimals. (The
    * 100-TB path swaps in `approx_percentile` — same plan shape, sketch
    * merge instead of a per-group sort buffer.) */
  def quantiles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // one percentile() call with an array argument = ONE value buffer
    // per group (4 separate calls would quadruple the agg state)
    Tables(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(expr("percentile(l_extendedprice, array(0.25D, 0.5D, 0.95D, 0.99D))")
        .as("ps"))
      .select($"l_returnflag",
        round($"ps"(0), 4).as("p25"), round($"ps"(1), 4).as("p50"),
        round($"ps"(2), 4).as("p95"), round($"ps"(3), 4).as("p99"))
      .orderBy($"l_returnflag")
  }

  /** The 100-TB quantiles path: same plan shape as [[quantiles]], but the
    * aggregation state is `approx_percentile`'s bounded sketch (KLL-style
    * merge) instead of the exact percentile's every-value-in-the-group
    * buffer — 3 groups × all of lineitem at 100 TB is an OOM in the exact
    * form, while the sketch is O(accuracy) per group per partition and
    * merges associatively map-side. rows-only (the sketch result is
    * engine-specific); QuantilesSpec bounds |approx − exact| rank error. */
  def quantilesApprox(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(expr(
        "approx_percentile(l_extendedprice, array(0.25D, 0.5D, 0.95D, 0.99D), 10000)")
        .as("ps"))
      .select($"l_returnflag",
        round($"ps"(0), 4).as("p25"), round($"ps"(1), 4).as("p50"),
        round($"ps"(2), 4).as("p95"), round($"ps"(3), 4).as("p99"))
      .orderBy($"l_returnflag")
  }

  val quantilesSql: String =
    """SELECT l_returnflag,
      |  round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
      |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
      |  round(quantile_cont(l_extendedprice, 0.95), 4) AS p95,
      |  round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Data-quality validation (the Deequ-style rules engine every
    * ingest gate runs): a fixed rule suite over lineitem — null rate,
    * value range, accepted values, non-negativity, composite-key
    * uniqueness — evaluated in ONE aggregation pass (every rule is a
    * conditional count; the unpivot of the 1-row result is
    * shuffle-free). Uniqueness is the one metric whose exact form
    * shuffles every key (`count_distinct` on the composite); at 100 TB
    * the drop-in sketch is `approx_count_distinct` — same plan,
    * bounded-error dup estimate — with the exact form kept here as the
    * oracle baseline (the quantiles/quantiles_approx split, applied to
    * DQ). Rules report violations, not exceptions: a failing rule is a
    * row with pass=false, so one report covers the whole suite — and
    * the synthetic data's non-unique (l_orderkey, l_linenumber) shows
    * up honestly as a failed uniqueness rule. */
  def dqChecks(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables(s, dir, "lineitem")
    val one = li.agg(
      sum(when($"l_quantity".isNull, 1L).otherwise(0L)).as("null_qty"),
      sum(when($"l_discount" < 0.0 || $"l_discount" > 0.1, 1L)
        .otherwise(0L)).as("bad_discount"),
      sum(when(not($"l_returnflag".isin("A", "N", "R")), 1L)
        .otherwise(0L)).as("bad_flag"),
      sum(when($"l_extendedprice" < 0.0, 1L).otherwise(0L)).as("neg_price"),
      // uniqueness is measured among rows whose key is PRESENT (both
      // engines' distinct-counts skip null keys, but the row count
      // must skip them too or a null-keyed row masquerades as a dup —
      // null keys are the not_null rules' concern, not uniqueness's)
      (sum(when($"l_orderkey".isNotNull && $"l_linenumber".isNotNull, 1L)
        .otherwise(0L)) -
        count_distinct($"l_orderkey", $"l_linenumber")).as("dup_keys"))
    one.select(expr(
        """stack(5,
          |  'accepted_values(l_returnflag)', bad_flag,
          |  'not_null(l_quantity)', null_qty,
          |  'range(l_discount,0,0.1)', bad_discount,
          |  'non_negative(l_extendedprice)', neg_price,
          |  'unique(l_orderkey,l_linenumber)', dup_keys
          |) AS (rule, violations)""".stripMargin))
      .withColumn("pass", $"violations" === 0L)
      .orderBy($"rule")
  }

  /** The 100-TB DQ path: identical rule suite and single-pass plan as
    * [[dqChecks]], with the one unbounded metric — composite-key
    * uniqueness, whose exact form shuffles every present key — swapped
    * for `approx_count_distinct` over the (non-null-guarded) key
    * struct. The sketch can over- OR under-estimate distincts, so the
    * dup estimate may come out slightly negative on a clean table;
    * `pass` therefore tests `violations <= tol` with tol = the
    * sketch's expected absolute error (rsd × present keys) — an exact
    * rule stays a hard zero, a sketched rule gets its honest error
    * bar. rows-only; ApproxDistinctSpec bounds the estimate against
    * the exact twin. */
  def dqChecksApprox(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables(s, dir, "lineitem")
    val rsd = 0.05
    val one = li.agg(
      sum(when($"l_quantity".isNull, 1L).otherwise(0L)).as("null_qty"),
      sum(when($"l_discount" < 0.0 || $"l_discount" > 0.1, 1L)
        .otherwise(0L)).as("bad_discount"),
      sum(when(not($"l_returnflag".isin("A", "N", "R")), 1L)
        .otherwise(0L)).as("bad_flag"),
      sum(when($"l_extendedprice" < 0.0, 1L).otherwise(0L)).as("neg_price"),
      sum(when($"l_orderkey".isNotNull && $"l_linenumber".isNotNull, 1L)
        .otherwise(0L)).as("present_keys"),
      // null-guarded struct: a row with a null key component yields a
      // null aggregate input, which the sketch skips — same population
      // as the exact twin's count_distinct(k1, k2)
      approx_count_distinct(
        when($"l_orderkey".isNotNull && $"l_linenumber".isNotNull,
          struct($"l_orderkey", $"l_linenumber")), rsd).as("approx_keys"))
      .withColumn("dup_keys", $"present_keys" - $"approx_keys")
      .withColumn("dup_tol", ceil($"present_keys" * rsd))
    one.select(expr(
        """stack(5,
          |  'accepted_values(l_returnflag)', bad_flag, CAST(0 AS BIGINT),
          |  'not_null(l_quantity)', null_qty, CAST(0 AS BIGINT),
          |  'range(l_discount,0,0.1)', bad_discount, CAST(0 AS BIGINT),
          |  'non_negative(l_extendedprice)', neg_price, CAST(0 AS BIGINT),
          |  'unique_approx(l_orderkey,l_linenumber)', dup_keys, dup_tol
          |) AS (rule, violations, tol)""".stripMargin))
      .withColumn("pass", $"violations" <= $"tol")
      .select($"rule", $"violations", $"pass")
      .orderBy($"rule")
  }

  val dqChecksSql: String =
    """WITH m AS (
      |  SELECT
      |    CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |      AS null_qty,
      |    CAST(sum(CASE WHEN l_discount < 0.0 OR l_discount > 0.1
      |      THEN 1 ELSE 0 END) AS BIGINT) AS bad_discount,
      |    CAST(sum(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R')
      |      THEN 1 ELSE 0 END) AS BIGINT) AS bad_flag,
      |    CAST(sum(CASE WHEN l_extendedprice < 0.0 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS neg_price,
      |    count(*) FILTER (l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL)
      |      - count(DISTINCT (l_orderkey, l_linenumber))
      |        FILTER (l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL)
      |      AS dup_keys
      |  FROM lineitem)
      |SELECT rule, violations, violations = 0 AS pass FROM (
      |  SELECT 'accepted_values(l_returnflag)' AS rule, bad_flag AS violations FROM m
      |  UNION ALL SELECT 'not_null(l_quantity)', null_qty FROM m
      |  UNION ALL SELECT 'range(l_discount,0,0.1)', bad_discount FROM m
      |  UNION ALL SELECT 'non_negative(l_extendedprice)', neg_price FROM m
      |  UNION ALL SELECT 'unique(l_orderkey,l_linenumber)', dup_keys FROM m)
      |ORDER BY rule""".stripMargin

  /** Order-priority report (TPC-H Q4's shape) — the suite's
    * EXISTS/semi-join exercise: orders in a window with AT LEAST ONE
    * returned line, counted per priority. The semantics that make
    * this a semi-join and not an inner join: an order with three
    * returned lines counts ONCE — `left_semi` encodes "exists"
    * directly, probing each order key until first match and never
    * duplicating the left row, where the inner-join-then-distinct
    * formulation materializes the fanout only to collapse it again.
    * The date filter pushes to the orders scan; both sides shuffle on
    * the natural join key (order key — high-cardinality, skew-free);
    * the final aggregation is ≤ |priorities| groups. */
  def q4(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "orders")
      .filter($"o_orderdate" >= lit("1995-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1997-01-01").cast("timestamp"))
      .join(
        Tables(s, dir, "lineitem")
          .filter($"l_returnflag" === "R").select($"l_orderkey"),
        $"o_orderkey" === $"l_orderkey", "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy($"o_orderpriority")
  }

  val q4Sql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1995-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Equi-DEPTH binning (the complement of [[histogram]]'s equi-width
    * bins): per return flag, lineitem prices split into 4 equal-count
    * bins via `ntile`, reporting each bin's population and value range
    * — the boundary report a partitioner or a percentile-based rule
    * derives its cutoffs from. `ntile` needs a total order, so ties
    * break by (orderkey, linenumber) — without that, rows AT a bin
    * boundary land nondeterministically and the bin min/max flap
    * between runs and engines.
    *
    * Scale: exact equi-depth costs one full per-group sort (the
    * WindowExec); that sort IS the operator's definition and the
    * oracle baseline. At 100 TB the drop-in is `approx_percentile`
    * boundaries + a binning scan (the [[quantilesApprox]] pattern) —
    * sketch state, no global sort, at the price of approximate
    * boundaries. */
  /** Price-bucket width for [[quantileBins]]' two-level exact rank
    * (r14 optimization): cumulative counts are computed per
    * (flag, floor(price/width)) bucket — thousands of parallel window
    * partitions — plus a tiny per-flag bucket-offset window, instead
    * of ntile's one total sort per flag (3 partitions total: the sf10
    * bench's 111 s entry, 9.9×/decade). Width 64 ≈ 1.6k buckets over
    * the testdata price range; any positive width is CORRECT (it only
    * shifts work between the two levels) — exact power of two keeps
    * the double division exact. */
  val BinBucketWidth = 64.0

  /** Equi-depth bins, EXACT ntile(4) semantics reproduced in integer
    * rank arithmetic (r14, guide §2.5: the per-flag total sort moved
    * all data to 3 partitions). Derivation: rows of one flag, ordered
    * by (price, okey, lnum), get ntile bins whose rank boundaries are
    * start_i = (i-1)·q + min(i-1, r) + 1, end_i = i·q + min(i, r)
    * with q = N div 4, r = N mod 4. A price value covering ranks
    * (pcum, cum] (cumulative counts over the price order — the
    * tie-break columns never matter because equal prices are
    * contiguous in rank space) overlaps bins binOf(pcum+1)..binOf(cum);
    * its overlap with bin i has exactly
    * min(cum, end_i) − max(pcum+1, start_i) + 1 rows. Summing overlaps
    * per bin gives ntile's exact n, and min/max price per bin are the
    * prices whose spans intersect the bin — identical (count, lo, hi)
    * to the window form for EVERY N (RelationalQueriesSpec asserts the
    * equivalence against a literal ntile run, boundary ties included;
    * the DuckDB oracle SQL is untouched). */
  def quantileBins(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    quantileBinsOn(Tables(s, dir, "lineitem")
      .select($"l_returnflag", $"l_extendedprice"))
  }

  /** The rank-arithmetic form over any (l_returnflag, l_extendedprice)
    * frame — spec surface: RelationalQueriesSpec drives crafted frames
    * (boundary ties, every N mod 4, N < 4) through this and the
    * literal ntile window side by side. */
  def quantileBinsOn(li: DataFrame): DataFrame = {
    val s = li.sparkSession
    import s.implicits._
    val cores = s.sparkContext.defaultParallelism
    val g = li
      .withColumn("bkt", floor($"l_extendedprice" / lit(BinBucketWidth)))
      // one exchange: hash by (flag, bucket); the per-price count and
      // both windows below all cluster on prefixes of this key
      .repartition(cores, $"l_returnflag", $"bkt")
      .groupBy($"l_returnflag", $"bkt", $"l_extendedprice")
      .agg(count(lit(1)).as("cnt"))
    val wIn = Window.partitionBy($"l_returnflag", $"bkt")
      .orderBy($"l_extendedprice")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inCum = g.withColumn("icum", sum($"cnt").over(wIn))
    // Bucket totals -> exclusive per-flag offsets + per-flag N. Built
    // from a SEPARATE direct partial-agg scan of the input, NOT from
    // `g`: the broadcast branches are physical re-executions of their
    // subtree, and re-running the repartition+groupBy+window pipeline
    // twice more measured 3.26 s steady-state vs 1.73 s baseline at
    // sf0.1 (the interrupted session's 13.9 s first-sweep reading was
    // this plus cold broadcasts). A groupBy(flag, bkt) straight off
    // the scan is map-side-combined into ~flags×buckets rows (KB) —
    // the cheap recompute the broadcast can afford.
    val bt = li
      .withColumn("bkt", floor($"l_extendedprice" / lit(BinBucketWidth)))
      .groupBy($"l_returnflag", $"bkt").agg(count(lit(1)).as("bn"))
    val wB = Window.partitionBy($"l_returnflag").orderBy($"bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = bt
      .withColumn("boff", coalesce(sum($"bn").over(wB), lit(0L)))
      .withColumn("nn", sum($"bn").over(Window.partitionBy($"l_returnflag")))
      .select($"l_returnflag", $"bkt", $"boff", $"nn")
    // binOf(rank): the bin whose [start, end] rank range contains
    // `rank` — integer ceil-division, exact at any N (DIV on longs)
    def binOf(rank: String): Column =
      when(col(rank) <= $"r" * ($"q" + 1),
        expr(s"($rank + q) DIV (q + 1)"))
        .otherwise($"r" +
          expr(s"($rank - r * (q + 1) + greatest(q, 1L) - 1) DIV greatest(q, 1L)"))
    inCum
      .join(broadcast(off), Seq("l_returnflag", "bkt"))
      .withColumn("cum", $"icum" + $"boff")
      .withColumn("pcum", $"cum" - $"cnt")
      .withColumn("q", expr("nn DIV 4"))
      .withColumn("r", $"nn" % 4)
      .withColumn("rka", $"pcum" + 1)
      .withColumn("b0", binOf("rka"))
      .withColumn("b1", binOf("cum"))
      .withColumn("binL", explode(sequence($"b0", $"b1")))
      .withColumn("bin", $"binL".cast("int"))
      .withColumn("st", ($"binL" - 1) * $"q" + least($"binL" - 1, $"r") + 1)
      .withColumn("en", $"binL" * $"q" + least($"binL", $"r"))
      .withColumn("ov", least($"cum", $"en") - greatest($"rka", $"st") + 1)
      .groupBy($"l_returnflag", $"bin")
      .agg(sum($"ov").as("n"),
        round(min($"l_extendedprice"), 4).as("lo"),
        round(max($"l_extendedprice"), 4).as("hi"))
      .orderBy($"l_returnflag", $"bin")
  }

  val quantileBinsSql: String =
    """WITH binned AS (
      |  SELECT l_returnflag, l_extendedprice,
      |    CAST(ntile(4) OVER (PARTITION BY l_returnflag
      |      ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS INT)
      |      AS bin
      |  FROM lineitem)
      |SELECT l_returnflag, bin, count(*) AS n,
      |  round(min(l_extendedprice), 4) AS lo,
      |  round(max(l_extendedprice), 4) AS hi
      |FROM binned GROUP BY l_returnflag, bin
      |ORDER BY l_returnflag, bin""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q4_priority_exists" -> (q4(_, _)),
    "quantile_bins" -> (quantileBins(_, _)),
    "dq_checks" -> (dqChecks(_, _)),
    "dq_checks_approx" -> (dqChecksApprox(_, _)),
    "quantiles" -> (quantiles(_, _)),
    "quantiles_approx" -> (quantilesApprox(_, _)),
    "profile_table" -> (profileTable(_, _)),
    "profile_table_approx" -> (profileTableApprox(_, _)),
    "corr_matrix" -> (corrMatrix(_, _)),
    "histogram" -> (histogram(_, _)),
    "q3_join" -> (q3(_, _)),
    "q5_multijoin" -> (q5(_, _)),
    "q13_custdist" -> (q13(_, _)),
    "q18_large_orders" -> (q18(_, _)),
    "q22_idle_rich" -> (q22(_, _)),
    "topk_window" -> (topkWindow(_, _)),
    "sessionize" -> (sessionize(_, _)),
    "sessionize_native" -> (sessionizeNative(_, _)),
    "stream_window_agg" -> (windowAgg(_, _)))

  def oracles: Map[String, String] = Map(
    "q4_priority_exists" -> q4Sql,
    "quantile_bins" -> quantileBinsSql,
    "dq_checks" -> dqChecksSql,
    "quantiles" -> quantilesSql,
    "profile_table" -> profileTableSql,
    "corr_matrix" -> corrMatrixSql,
    "histogram" -> histogramSql,
    "q3_join" -> q3Sql,
    "q5_multijoin" -> q5Sql,
    "q13_custdist" -> q13Sql,
    "q18_large_orders" -> q18Sql,
    "q22_idle_rich" -> q22Sql,
    "topk_window" -> topkWindowSql,
    "sessionize" -> sessionizeSql,
    "sessionize_native" -> sessionizeNativeSql,
    "stream_window_agg" -> windowAggSql)
}
