package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.operators.Skew

/** Skew.saltedEquiJoin: result equality with the plain join on a
  * pathologically skewed key distribution. */
class SkewSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("salted join == plain join on 90%-one-key fact data") {
    val s = spark
    import s.implicits._
    // 9000 rows of key 1, a sprinkle of others — the shape AQE alone
    // can't always split when the dim side isn't broadcastable
    val fact = ((1 to 9000).map(i => (1L, i.toLong)) ++
      (1 to 1000).map(i => ((i % 50 + 2).toLong, i.toLong)))
      .toDF("k", "rowid")
    val dim = (1 to 60).map(i => (i.toLong, s"name_$i")).toDF("k", "name")
    val plain = fact.join(dim, "k")
      .select($"k", $"rowid", $"name").collect().map(_.toSeq).toSet
    val salted = Skew.saltedEquiJoin(fact, dim, "k", "rowid", salts = 8)
      .select($"k", $"rowid", $"name").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(salted.size == 10000)
  }
}
