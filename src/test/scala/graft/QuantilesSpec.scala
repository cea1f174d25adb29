package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.operators.RelationalQueries

/** The approx-quantiles scale twin must track the exact form: same
  * schema, same groups, values within the sketch's rank-error bound.
  * With accuracy = 10000 the rank error is ≤ 1/10000, which on the
  * sf0.001 lineitem value range comfortably bounds the absolute error
  * below 1% of the per-group value spread. */
class QuantilesSpec extends AnyFunSuite with BeforeAndAfterAll {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("quantiles_approx matches exact quantiles within tolerance") {
    val exact = RelationalQueries.quantiles(spark, sf).collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val approx = RelationalQueries.quantilesApprox(spark, sf).collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(approx.keySet == exact.keySet, "same groups")
    // tolerance: 1% of the group's p99—p25 spread (rank error 1e-4 at
    // accuracy=10000 is far tighter; this bound is robust to data edits)
    for ((g, ex) <- exact) {
      val ap = approx(g)
      val spread = math.max(ex.last - ex.head, 1.0)
      ex.zip(ap).zipWithIndex.foreach { case ((e, a), i) =>
        assert(math.abs(e - a) <= 0.01 * spread,
          s"group $g quantile #$i: exact=$e approx=$a spread=$spread")
      }
    }
  }

  test("quantiles_approx has the same schema as quantiles") {
    val ex = RelationalQueries.quantiles(spark, sf)
    val ap = RelationalQueries.quantilesApprox(spark, sf)
    assert(ex.schema.fieldNames.sameElements(ap.schema.fieldNames))
  }
}
