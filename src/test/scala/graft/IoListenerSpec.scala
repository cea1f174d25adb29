package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The bench artifact's byte columns are only as trustworthy as the
  * listener behind them: these pin that (a) a shuffling query actually
  * registers shuffle read+write bytes after a bus drain, (b) a
  * shuffle-free scan registers none, and (c) deltas are monotone — the
  * snapshot protocol Bench's per-query accounting depends on. */
class IoListenerSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("shuffle bytes register after drain; scans register none") {
    val s = spark
    import s.implicits._
    val listener = new IoListener
    spark.sparkContext.addSparkListener(listener)
    try {
      // AQE can plan tiny local shuffles away entirely; a plain
      // repartition-by-key over enough distinct keys always exchanges
      val df = (1 to 50000).toDF("k")
      df.repartition(4, $"k").agg(sum($"k")).collect()
      org.apache.spark.graft.ListenerDrain.drain(spark.sparkContext)
      val afterShuffle = listener.snapshot
      assert(afterShuffle._1 > 0L, "shuffle read bytes must register")
      assert(afterShuffle._2 > 0L, "shuffle write bytes must register")

      // a narrow map-only job moves nothing through the shuffle
      df.select($"k" + 1).write.mode("overwrite").format("noop").save()
      org.apache.spark.graft.ListenerDrain.drain(spark.sparkContext)
      val afterScan = listener.snapshot
      assert(afterScan._1 == afterShuffle._1 && afterScan._2 == afterShuffle._2,
        s"map-only job must add no shuffle bytes: $afterShuffle -> $afterScan")
      assert(afterScan._3 >= 0L)
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
