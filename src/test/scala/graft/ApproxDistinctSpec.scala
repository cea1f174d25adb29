package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.operators.RelationalQueries

/** The approx_count_distinct twins (profile_table_approx,
  * dq_checks_approx) are rows-only in the driver gate — the sketch
  * estimate is engine-specific — so THIS spec is their correctness
  * contract: same schema and exact-metric values as the exact twins,
  * and distinct estimates within the HLL++ error bound. */
class ApproxDistinctSpec extends AnyFunSuite with BeforeAndAfterAll {
  private val sf = "/root/testdata/sf0.01"
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // default rsd 0.05; 3σ plus a small-count floor
  private def withinHll(approx: Long, exact: Long): Boolean =
    math.abs(approx - exact) <= math.max(3L, math.ceil(0.15 * exact).toLong)

  test("profile_table_approx: exact stats identical, distincts within HLL bound") {
    val exact = RelationalQueries.profileTable(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val approx = RelationalQueries.profileTableApprox(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (c, e) =>
      val a = approx(c)
      // min / max / null-count are not sketched — bit-identical
      assert(a.getDouble(1) == e.getDouble(1), s"$c min")
      assert(a.getDouble(2) == e.getDouble(2), s"$c max")
      assert(a.getLong(3) == e.getLong(3), s"$c nulls")
      assert(withinHll(a.getLong(4), e.getLong(4)),
        s"$c distinct: approx=${a.getLong(4)} exact=${e.getLong(4)}")
    }
  }

  test("dq_checks_approx: exact rules identical, dup estimate within HLL bound") {
    val exact = RelationalQueries.dqChecks(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = RelationalQueries.dqChecksApprox(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(approx.length == 5)
    // the four non-sketched rules carry the exact twin's values and a
    // hard-zero pass test
    approx.filterNot(_._1.startsWith("unique_approx")).foreach {
      case (rule, v, pass) =>
        assert(v == exact(rule), rule)
        assert(pass == (v == 0L), rule)
    }
    val (_, dupApprox, _) =
      approx.find(_._1.startsWith("unique_approx")).get
    val dupExact = exact("unique(l_orderkey,l_linenumber)")
    val present = Tables(spark, sf, "lineitem")
      .filter("l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL").count()
    // dup estimate = present − HLL(distinct); its absolute error is the
    // sketch's error on the distinct count: rsd × distinct ≤ rsd × present
    assert(math.abs(dupApprox - dupExact) <= math.max(3L, (0.15 * present).toLong),
      s"dup approx=$dupApprox exact=$dupExact present=$present")
  }
}
