package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.operators.Similarity

/** The ANN index persistence contract: a saved index reloads into the
  * train-once cache and every ANN query consumes it — same results as
  * fresh training, with no training pass after the load. */
class AnnIndexSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("save + load round-trips: loaded index reproduces fresh results") {
    val dir = "/root/testdata/sf0.001"
    val path = java.nio.file.Files.createTempDirectory("graft_annidx").toString
    Similarity.clearTrainCache()
    val freshIvf = SparkEntry.queries("ann_ivf")(spark, dir).collect().toSeq
    val freshPq = SparkEntry.queries("ann_pq")(spark, dir).collect().toSeq
    Similarity.saveAnnIndex(spark, dir, path)

    Similarity.clearTrainCache()
    Similarity.loadAnnIndex(spark, dir, path)
    val loadedIvf = SparkEntry.queries("ann_ivf")(spark, dir).collect().toSeq
    val loadedPq = SparkEntry.queries("ann_pq")(spark, dir).collect().toSeq
    assert(loadedIvf == freshIvf, "IVF results must match fresh training")
    assert(loadedPq == freshPq, "PQ results must match fresh training")
  }
}
