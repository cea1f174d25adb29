package graft

import org.scalatest.funsuite.AnyFunSuite

/** Standing plan audit over EVERY registered query — the structural
  * scale rules the round verdicts keep re-teaching, enforced as a gate
  * instead of re-learned per round:
  *
  *   1. No partition-less Window: `Window.orderBy(...)` drags the whole
  *      input through ONE partition (the round-7 `q15_top_supplier`
  *      finding, and round 3's `skew_report` before it — top-1 picks
  *      must be `orderBy().limit()` → TakeOrderedAndProject). The two
  *      allowlisted queries are global ranks BY DEFINITION — exact
  *      percentile/rank cuts kept as the ORACLE BASELINES for their
  *      shipped approx twins (`lm_buckets` → `lm_buckets_approx`,
  *      `dsir_sample` → `dsir_sample_approx`, both registry entries
  *      with window-free plans this same audit covers; the twins'
  *      specs bound |approx − exact| drift). Nothing else may join the
  *      allowlist without shipping its twin first.
  *   2. No unconditioned join unless one side is provably tiny
  *      (`maxRows` ≤ 64 — the 1-row global-aggregate broadcasts the
  *      corpus-total patterns use, and the local-relation dimension
  *      legs of the gap-fill grids): anything else is a latent
  *      cartesian product.
  *
  * Runs on the optimized logical plan at sf0.001 (building a frame
  * executes the eager driver-loop queries, so the audit doubles as a
  * smoke pass over the whole registry). */
class PlanAuditSpec extends AnyFunSuite {
  // own getOrCreate, NOT the shared SparkTestSession lazy val: suites
  // run sequentially and several stop the then-current session in
  // afterAll, so a stale object-cached instance can be dead by the
  // time this (late, long) suite runs — getOrCreate re-creates on a
  // stopped default
  private lazy val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  private val sf = "/root/testdata/sf0.001"

  /** Global-rank-by-definition queries — oracle baselines whose shipped
    * scale paths are the `_approx` twins (window-free, audited above). */
  private val globalWindowByDesign = Set("lm_buckets", "dsir_sample")

  test("every registered query: no stray global window, no cartesian") {
    import org.apache.spark.sql.catalyst.plans.logical.{Join, Window => LWindow}
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.optimizedPlan
      val globalWindow = plan.collect {
        case w: LWindow if w.partitionSpec.isEmpty => w
      }.nonEmpty
      if (globalWindow && !globalWindowByDesign(name))
        offenders += s"$name: partition-less window"
      if (!globalWindow && globalWindowByDesign(name))
        offenders += s"$name: allowlisted but clean — tighten the allowlist"
      plan.foreach {
        case j: Join if j.condition.isEmpty =>
          val bounded = Seq(j.left, j.right).exists(_.maxRows.exists(_ <= 64L))
          if (!bounded) offenders += s"$name: unconditioned join, unbounded sides"
        case _ =>
      }
    }
    assert(offenders.isEmpty, offenders.mkString("; "))
  }
}
