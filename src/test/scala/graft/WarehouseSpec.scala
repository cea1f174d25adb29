package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.operators.{EventAnalytics, Warehouse}

/** Warehouse changelog-operator laws on sf0.001 (exact values are
  * DuckDB-oracle-checked via the driver contract; these are the
  * structural invariants a MERGE/SCD2 implementation must not lose). */
class WarehouseSpec extends AnyFunSuite with BeforeAndAfterAll {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("scd2 history tiles: intervals chain, one current row per user") {
    val rows = Warehouse.scd2History(spark, sf).collect()
    val byUser = rows.groupBy(_.getLong(0))
    byUser.foreach { case (_, vs) =>
      val sorted = vs.sortBy(_.getInt(1))
      // versions are 1..n dense
      assert(sorted.map(_.getInt(1)).toSeq == (1 to sorted.length))
      // exactly one open interval, and it is the last version
      assert(vs.count(_.getBoolean(5)) == 1)
      assert(sorted.last.isNullAt(4) && sorted.last.getBoolean(5))
      // each valid_to equals the next version's valid_from (no gaps,
      // no overlaps), and consecutive versions change status
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getTimestamp(4) == b.getTimestamp(3))
          assert(a.getString(2) != b.getString(2))
        case _ =>
      }
    }
  }

  test("merge of snapshot + delta equals whole-log replay") {
    import spark.implicits._
    // the associativity anchor: the two-stage merge must lose nothing
    // vs replaying the full changelog with the same semantics
    val merged = Warehouse.mergeUpsert(spark, sf)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id")
      .orderBy(date_trunc("second", $"ts").desc, $"event_id".desc)
    val replay = Tables(spark, sf, "events")
      .withColumn("rk", row_number().over(w))
      .filter($"rk" === 1 && $"event_type" =!= Warehouse.TombstoneType)
      .select($"user_id", $"event_id".as("last_event_id"),
        $"event_type".as("last_type"), round($"value", 4).as("last_value"))
    assert(merged.exceptAll(replay).isEmpty && replay.exceptAll(merged).isEmpty)
    // tombstone semantics actually fired on this data: some user's
    // last event is the tombstone type, and that user is absent
    val lastTypes = EventAnalytics.cdcLatest(spark, sf)
      .select("user_id", "last_type").collect()
    val dropped = lastTypes.filter(_.getString(1) == Warehouse.TombstoneType)
    assert(dropped.nonEmpty, "synthetic data lost its tombstone-last user")
    val mergedUsers = merged.select("user_id").collect().map(_.getLong(0)).toSet
    dropped.foreach(r => assert(!mergedUsers.contains(r.getLong(0))))
  }

  test("table diff is a total classification consistent with both states") {
    val diff = Warehouse.tableDiff(spark, sf).collect()
    // every key exactly once
    assert(diff.map(_.getLong(0)).distinct.length == diff.length)
    val byClass = diff.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    val before = diff.count(r => !r.isNullAt(2))
    val after = diff.count(r => !r.isNullAt(3))
    assert(byClass.getOrElse("added", 0) == after - (before - byClass.getOrElse("removed", 0)))
    // removed rows have no new side; added rows have no old side
    diff.foreach { r =>
      r.getString(1) match {
        case "removed" => assert(r.isNullAt(3) && !r.isNullAt(2))
        case "added"   => assert(r.isNullAt(2) && !r.isNullAt(3))
        case _         => assert(!r.isNullAt(2) && !r.isNullAt(3))
      }
    }
  }

  test("scd2 join matches the brute-force interval probe") {
    import spark.implicits._
    // independent formulation: inequality join against the history's
    // tiling intervals (what the union-sort carry must reproduce)
    val joined = Warehouse.scd2Join(spark, sf)
    val dim = Warehouse.scd2Core(spark, sf)
    val purchases = Tables(spark, sf, "events")
      .filter($"event_type" === "purchase")
      .select($"user_id", date_trunc("second", $"ts").as("t"), $"event_id")
    val brute = purchases.as("p").join(dim.as("d"),
        $"p.user_id" === $"d.user_id" && $"d.valid_from" <= $"p.t" &&
          ($"d.valid_to".isNull || $"p.t" < $"d.valid_to"))
      .select($"p.user_id", $"p.event_id", $"p.t", $"d.version", $"d.status")
    assert(joined.count() == purchases.count(), "every purchase matches")
    assert(joined.exceptAll(brute).isEmpty && brute.exceptAll(joined).isEmpty)
  }

  test("rolling daily bands: dense grid, frame laws hold") {
    val rows = EventAnalytics.rollingDaily(spark, sf).collect()
    val types = EventAnalytics.EventTypes.toSet
    val days = rows.map(_.getTimestamp(0)).distinct.length
    assert(rows.length == days * types.size)
    rows.foreach { r =>
      val (n, avg7, min7, max7) =
        (r.getLong(2), r.getDouble(3), r.getLong(4), r.getLong(5))
      assert(min7 <= n && n <= max7)
      assert(min7 <= avg7 && avg7 <= max7)
    }
  }
}
