package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.functions.MoneySum

/** Contract for the primitive-buffer exact money sum
  * ([[graft.functions.MoneySum]]): bit-identical to the DECIMAL(28,4)
  * accumulation it replaced (the round-10 order-independence
  * discipline), including the 128-bit carry path a plain BIGINT sum
  * would wrap on, null terms, all-null groups, and negative values. */
class MoneySumSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def decimalSum(c: org.apache.spark.sql.Column) =
    sum(round(c, 4).cast("decimal(28,4)")).cast("double")

  test("moneySum == DECIMAL accumulation on randomized money values") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    // 2-decimal prices × 2-decimal rates: exact 4-decimal terms, mixed
    // signs, magnitudes up to ~1e7 — the q1/q6/cube term population
    val rows = (1 to 50000).map { i =>
      val price = math.round(rnd.nextDouble() * 1e9) / 100.0
      val rate = math.round(rnd.nextDouble() * 100) / 100.0
      val sign = if (rnd.nextBoolean()) 1 else -1
      (i % 7, sign * price * rate)
    }
    val df = rows.toDF("g", "v").repartition(13)
    val got = df.groupBy($"g").agg(MoneySum(round($"v", 4)).as("m"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val want = df.groupBy($"g").agg(decimalSum($"v").as("m"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(got == want)
    // and order-independence: a different partitioning, same bits
    val got2 = df.repartition(3).groupBy($"g")
      .agg(MoneySum(round($"v", 4)).as("m"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(got2 == got)
  }

  test("128-bit carry: sums past Long.MaxValue ten-thousandths are exact") {
    val s = spark
    import s.implicits._
    // each term is 2e14 money units = 2e18 ten-thousandths; five of
    // them pass Long.MaxValue (9.2e18) — a plain BIGINT sum wraps,
    // the (hi, lo) accumulator must not. (Term magnitude exceeds the
    // Money4Bits 2^51 window, so feed exact powers of two: 2^47 money
    // units = 2^47·10^4 ten-thousandths, exactly representable.)
    val term = math.pow(2, 47) // integral double, round(·,4) exact
    val df = Seq.fill(1000)(term).toDF("v").repartition(11)
    val got = df.agg(MoneySum(round($"v", 4)).as("m")).head.getDouble(0)
    assert(got == 1000.0 * term, s"got $got")
    // reference: BigDecimal accumulation
    val want = df.agg(decimalSum($"v").as("m")).head.getDouble(0)
    assert(got == want)
  }

  test("nulls ignored; all-null and empty groups yield NULL like sum()") {
    val s = spark
    import s.implicits._
    val df = Seq[(Int, Option[Double])](
      (1, Some(1.5)), (1, None), (2, None), (2, None))
      .toDF("g", "v")
    val rows = df.groupBy($"g").agg(MoneySum(round($"v", 4)).as("m"))
      .collect().map(r => r.getInt(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(rows(1) == 1.5)
    assert(rows(2) == null, "all-null group must be NULL, not 0.0")
    val empty = df.filter($"g" > 99).agg(MoneySum(round($"v", 4)).as("m")).head
    assert(empty.isNullAt(0), "global agg over zero rows must be NULL")
  }

  test("the >4-decimal footgun is REAL: unrounded 5-decimal terms diverge") {
    // TpchExtra.moneySum drops the per-row round(term, 4) under the
    // documented precondition (every caller's term is exact at ≤ 4
    // decimals). This pins what happens when a future caller breaks it
    // (ADVICE r11): on a genuine 5th decimal, Money4Bits' Math.round
    // rounds ties toward +inf — so a NEGATIVE tie (-0.00005) lands on
    // 0, while the oracle contract (DuckDB DECIMAL / Spark round() =
    // HALF_UP, away from zero) lands on -0.0001. A caller with
    // unknown-scale input must keep the explicit round(term, 4).
    val s = spark
    import s.implicits._
    val df = Seq(-0.00005).toDF("v")
    val bare = df.agg(MoneySum($"v").as("m")).head.getDouble(0)
    val rounded = df.agg(MoneySum(round($"v", 4)).as("m")).head.getDouble(0)
    val oracle = df.agg(decimalSum($"v").as("m")).head.getDouble(0)
    assert(rounded == oracle && rounded == -0.0001,
      s"explicit round must match HALF_UP: $rounded vs $oracle")
    assert(bare != oracle,
      "expected divergence vanished — if Money4Bits gained real HALF_UP " +
        "tie handling, moneySum's precondition doc is stale; update both")
    assert(bare == 0.0, s"ties-toward-+inf should land on 0, got $bare")
  }

  test("negative totals and the sign-extension path") {
    val s = spark
    import s.implicits._
    val df = Seq(-0.0001, -123456.789, 0.00005, 99.999).toDF("v")
    val got = df.agg(MoneySum(round($"v", 4)).as("m")).head.getDouble(0)
    val want = df.agg(decimalSum($"v").as("m")).head.getDouble(0)
    assert(got == want)
    assert(got < 0)
  }
}
