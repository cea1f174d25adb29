package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.functions.{MarkerCounts, TextFeatures}

/** MarkerCounts must be a pure compute-route change: identical values
  * to the composed size/filter/split column forms it replaced (the
  * DuckDB oracles are written against those semantics). */
class TextAnalysisSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("MarkerCounts == composed size/filter forms on docs + edge cases") {
    val s = spark
    import s.implicits._
    val markers = Seq(Seq("the", "a", "of"), Seq("der", "die", "und"))
    val edge = Seq("", "   ", "the THE tHe", "a\t\na  of", "ünïcode the ü")
      .toDF("text")
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select($"text").limit(300).unionByName(edge)
    val ts = TextFeatures.toks(lower($"text"))
    def composedCount(words: Seq[String]) =
      size(filter(ts, t => words.map(w => t === lit(w)).reduce(_ || _)))
    val cmp = docs
      .withColumn("mc", MarkerCounts($"text", markers))
      .withColumn("want_total", size(ts).cast("long"))
      .withColumn("want_0", composedCount(markers(0)).cast("long"))
      .withColumn("want_1", composedCount(markers(1)).cast("long"))
      .filter($"mc"(0) =!= $"want_total" ||
        $"mc"(1) =!= $"want_0" || $"mc"(2) =!= $"want_1")
    assert(cmp.count() == 0, "marker counts must equal the composed forms")
  }

  test("lang_id and quality_score plans tokenize once") {
    val sf = "/root/testdata/sf0.001"
    for (q <- Seq("lang_id", "quality_score")) {
      val plan = SparkEntry.queries(q)(spark, sf).queryExecution
        .optimizedPlan.toString
      assert(!plan.contains("split("),
        s"$q must tokenize via marker_counts, not per-column split: found split( in plan")
    }
  }
}
