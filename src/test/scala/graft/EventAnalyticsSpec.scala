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

  test("retention cohorts: week-0 cell is the full cohort, rates in (0,1]") {
    val rows = EventAnalytics.retentionCohorts(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (k, active, size, rate) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(k >= 0L)
      assert(active <= size)
      assert(rate > 0.0 && rate <= 1.0)
      // by construction every cohort member is active in their week 0
      if (k == 0) assert(active == size)
    }
  }

  test("event paths: 3-step shingle counts conserve each session's length") {
    import org.apache.spark.sql.functions._
    val top = EventAnalytics.eventPaths(spark, sf).collect()
    // sf0.001 sessions are mostly < 3 events, so fewer than PathTopK
    // distinct paths can exist — the top-k is capped, not padded
    assert(top.length <= EventAnalytics.PathTopK && top.nonEmpty)
    val counts = top.map(_.getLong(1))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
    top.foreach(r => assert(r.getString(0).split(" ").length == 3))
    // every (user, session) with k ≥ 3 events contributes exactly k-2
    // paths — check the UNLIMITED path total against that identity
    val ev = Tables(spark, sf, "events")
      .filter(col("event_type").isNotNull)
      .select(col("user_id"), date_trunc("second", col("ts")).as("ts"),
        col("event_id"), col("event_type"))
    val sess = operators.RelationalQueries.withSessionIds(ev)
    val perSess = sess
      .groupBy(col("user_id"), col("sess_id")).count()
      .collect().map(_.getLong(2))
    val wantPaths = perSess.map(k => math.max(0L, k - 2)).sum
    val allPaths = sess
      .select(col("user_id"), col("sess_id"),
        struct(col("ts"), col("event_id"), col("event_type")).as("e"))
      .groupBy(col("user_id"), col("sess_id"))
      .agg(sort_array(collect_list(col("e"))).as("es"))
      .select(explode(graft.functions.TextFeatures.wordNgrams(
        expr("transform(es, x -> x.event_type)"), 3)).as("p"))
      .count()
    assert(allPaths == wantPaths)
  }

  test("event paths: hot-user state is bounded per session, no cross-gap shingles") {
    import spark.implicits._
    // A synthetic bot user: 200 sessions of 3 events each, separated by
    // >30-min gaps. Sessionized shingling aggregates 200 groups of 3
    // events instead of one 600-event array, and the only path that can
    // exist is the within-session "a b c" — a cross-gap shingle
    // ("b c a" / "c a b") appearing at all would mean a path straddled
    // the session boundary.
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val types = Array("a", "b", "c")
    val rows = for (sess <- 0 until 200; i <- 0 until 3) yield (
      7L,
      new java.sql.Timestamp(base.getTime + sess * 3600_000L + i * 10_000L),
      (sess * 3 + i).toLong,
      types(i))
    val ev = rows.toDF("user_id", "ts", "event_id", "event_type")
    // the aggregation groups really are session-sized
    val maxGroup = operators.RelationalQueries.withSessionIds(
        ev.select($"user_id", $"ts", $"event_id"))
      .groupBy($"user_id", $"sess_id").count()
      .agg(org.apache.spark.sql.functions.max($"count")).head().getLong(0)
    assert(maxGroup == 3L, s"expected 3-event sessions, got $maxGroup")
    val out = EventAnalytics.eventPathsOn(ev).collect()
    assert(out.length == 1, out.mkString(";"))
    assert(out.head.getString(0) == "a b c")
    assert(out.head.getLong(1) == 200L)
  }

  test("transitions: gap breaks the chain, per-from probabilities sum to 1") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // user 1: a→b→c inside one session, then a >30-min gap, then c→a.
    // The a-after-gap pair (c at 00:10, a at 01:00) must NOT count.
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "a"),
      (1L, ts("2024-01-01 00:05:00"), 2L, "b"),
      (1L, ts("2024-01-01 00:10:00"), 3L, "c"),
      (1L, ts("2024-01-01 01:00:00"), 4L, "c"),
      (1L, ts("2024-01-01 01:01:00"), 5L, "a"),
      (2L, ts("2024-01-01 00:00:00"), 6L, "a"),
      (2L, ts("2024-01-01 00:01:00"), 7L, "c"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = EventAnalytics.eventTransitionsOn(ev).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      ("a", "b", 1L, 0.5), ("a", "c", 1L, 0.5),
      ("b", "c", 1L, 1.0), ("c", "a", 1L, 1.0)), out.mkString(";"))
    // real data: every from-state's probabilities sum to 1 (±rounding)
    val sums = EventAnalytics.eventTransitions(spark, sf)
      .groupBy($"from_type").agg(sum($"p").as("s")).collect()
    sums.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 0.001, r))
  }

  test("anomaly hours: every flagged cell is >3 sigma for its type") {
    val dense = EventAnalytics.resampleHourly(spark, sf)
      .select("hour", "event_type", "n").collect()
      .groupBy(_.getString(1))
    val flagged = EventAnalytics.anomalyHours(spark, sf).collect()
    assert(flagged.nonEmpty)
    flagged.foreach { r =>
      val cells = dense(r.getString(1)).map(_.getLong(2).toDouble)
      val m = cells.sum / cells.length
      val sd = math.sqrt(cells.map(x => (x - m) * (x - m)).sum / (cells.length - 1))
      val z = (r.getLong(2) - m) / sd
      assert(math.abs(z) > 3.0, s"flagged cell not anomalous: $r z=$z")
      assert(math.abs(z - r.getDouble(3)) < 0.001)
    }
  }

  test("audience overlap: sketch estimates track the exact set algebra") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val est = EventAnalytics.audienceOverlap(spark, sf).collect()
    assert(est.length == 10) // C(5,2) type pairs
    // exact pairwise union via a second scan (the thing the sketch avoids)
    val ev = Tables(spark, sf, "events")
      .filter($"event_type".isNotNull)
      .select($"event_type", $"user_id",
        to_date($"ts").as("day"))
    val exact = est.map { r =>
      val (ta, tb) = (r.getString(0), r.getString(1))
      val u = ev.filter($"event_type".isin(ta, tb))
        .select($"user_id", $"day").distinct().count()
      (ta, tb) -> u
    }.toMap
    est.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      val (u, estU) = (exact(key).toDouble, r.getLong(4).toDouble)
      // KMV with k=64 → relative error ~1/sqrt(62) ≈ 13%; allow 3x
      assert(math.abs(estU - u) / u < 0.4,
        s"$key union est $estU vs exact $u")
      val exactI = r.getLong(2) + r.getLong(3) - exact(key)
      assert(math.abs(r.getLong(5) - exactI) / exactI.toDouble < 0.5,
        s"$key intersect est ${r.getLong(5)} vs exact $exactI")
    }
  }

  test("resample: dense hour grid, zero-filled gaps, counts conserved") {
    import org.apache.spark.sql.functions._
    val rows = EventAnalytics.resampleHourly(spark, sf)
    val n = rows.count()
    // dense grid: every (hour in closed range) × every type is present
    assert(n % EventAnalytics.EventTypes.size == 0)
    val hours = rows.select(countDistinct(col("hour"))).head().getLong(0)
    assert(n == hours * EventAnalytics.EventTypes.size)
    // densification adds rows, never loses events
    val total = rows.agg(sum(col("n"))).head().getLong(0)
    assert(total == Tables(spark, sf, "events").count())
    // sf0.001 is sparse enough that some cells must be zero-filled
    assert(rows.filter(col("n") === 0).count() > 0)
  }

  test("skew report: ranked hot keys, shares sane, heap-based top-k plan") {
    import org.apache.spark.sql.functions._
    val rep = EventAnalytics.skewReport(spark, sf)
    val rows = rep.collect()
    assert(rows.length == EventAnalytics.SkewTopK)
    assert(rows.map(_.getInt(0)).toSeq == (1 to EventAnalytics.SkewTopK))
    val shares = rows.map(_.getDouble(3))
    assert(shares.forall(s => s > 0.0 && s < 1.0))
    assert(shares.zip(shares.tail).forall { case (a, b) => a >= b })
    // the hottest key really is the corpus max
    val trueMax = Tables(spark, sf, "events")
      .groupBy(col("user_id")).count()
      .agg(max(col("count"))).head().getLong(0)
    assert(rows.head.getLong(2) == trueMax)
    // top-k must be a per-partition heap, not a global rank window
    assert(rep.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
  }

  test("salted skew join equals the plain join") {
    import org.apache.spark.sql.functions._
    val salted = EventAnalytics.skewJoinSalted(spark, sf).collect()
    val ev = Tables(spark, sf, "events").select(col("user_id"), col("value"))
    val cust = Tables(spark, sf, "customer")
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    val plain = ev.join(cust, "user_id")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"),
        count_distinct(col("user_id")).as("n_users"))
      .orderBy(col("c_mktsegment"))
      .collect()
    assert(salted.toSeq == plain.toSeq)
  }
}
