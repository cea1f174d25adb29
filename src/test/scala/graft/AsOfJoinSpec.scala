package graft

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.operators.AsOfJoin

/** AsOfJoin.asOf against hand-computed point-in-time semantics. */
class AsOfJoinSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOf: latest right <= left per key; equal instants match; no right -> null") {
    val s = spark
    import s.implicits._
    val left = Seq(
      (1L, ts("2026-01-01 10:00:00"), "a"),
      (1L, ts("2026-01-01 12:00:00"), "b"),
      (1L, ts("2026-01-01 09:00:00"), "c"),  // before any right row
      (2L, ts("2026-01-01 11:00:00"), "d"),  // key with no right rows
      (3L, ts("2026-01-01 11:00:00"), "e"))  // equal-instant match
      .toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts("2026-01-01 09:30:00")),
      (1L, ts("2026-01-01 11:30:00")),
      (3L, ts("2026-01-01 11:00:00")))
      .toDF("k", "t")
    val out = AsOfJoin.asOf(left, right, "k", "t")
      .collect()
      .map(r => r.getString(2) -> Option(r.getTimestamp(3)).map(_.toString))
      .toMap
    assert(out("a") == Some("2026-01-01 09:30:00.0"))
    assert(out("b") == Some("2026-01-01 11:30:00.0"))
    assert(out("c") == None)
    assert(out("d") == None)
    assert(out("e") == Some("2026-01-01 11:00:00.0")) // >= semantics
  }

  test("asOfForward: earliest right >= left per key; equal instants match") {
    val s = spark
    import s.implicits._
    val left = Seq(
      (1L, ts("2026-01-01 10:00:00"), "a"),  // next right is 11:30
      (1L, ts("2026-01-01 12:00:00"), "b"),  // after every right row
      (1L, ts("2026-01-01 09:00:00"), "c"),  // next right is 09:30
      (2L, ts("2026-01-01 11:00:00"), "d"),  // key with no right rows
      (3L, ts("2026-01-01 11:00:00"), "e"))  // equal-instant match
      .toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts("2026-01-01 09:30:00")),
      (1L, ts("2026-01-01 11:30:00")),
      (3L, ts("2026-01-01 11:00:00")))
      .toDF("k", "t")
    val out = AsOfJoin.asOfForward(left, right, "k", "t")
      .collect()
      .map(r => r.getString(2) -> Option(r.getTimestamp(3)).map(_.toString))
      .toMap
    assert(out("a") == Some("2026-01-01 11:30:00.0"))
    assert(out("b") == None)
    assert(out("c") == Some("2026-01-01 09:30:00.0"))
    assert(out("d") == None)
    assert(out("e") == Some("2026-01-01 11:00:00.0")) // <= semantics
  }
}
