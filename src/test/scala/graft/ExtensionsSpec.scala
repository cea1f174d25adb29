package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** [[GraftExtensions]]: the engine's native expressions callable from
  * plain `spark.sql`, registered via the standard SparkSessionExtensions
  * mechanism. */
class ExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark: SparkSession = {
    // Extensions apply only at session construction — drop any session
    // another suite left behind (suites run sequentially in this JVM).
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    GraftSession.builder("4").withExtensions(new GraftExtensions).getOrCreate()
  }

  override def afterAll(): Unit = {
    spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
  }

  test("poly_hash / word_ngrams / simhash64 / dot_product from SQL") {
    val r = spark.sql(
      """SELECT poly_hash('a') AS h,
        |  poly_hash('a', 131) AS h131,
        |  word_ngrams('x y z w', 3) AS g,
        |  simhash64(array('x', 'y')) AS sh,
        |  dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dp,
        |  log2_fixed(1L, 2L) AS lf""".stripMargin)
      .head()
    assert(r.getLong(0) == 'a'.toLong)
    assert(r.getLong(1) == 'a'.toLong)
    assert(r.getSeq[String](2) == Seq("x y z", "y z w"))
    assert(r.getLong(3) >= 0L)
    assert(r.getDouble(4) == 11.0)
    assert(r.getLong(5) == 65536L, "-log2(1/2) = exactly one bit")
  }

  test("word_ngram_hashes / bounded_collect from SQL") {
    val r = spark.sql(
      """SELECT word_ngram_hashes('x y z w', 3) AS hs,
        |  (SELECT bounded_collect(v, 3) FROM VALUES (1L), (2L), (3L), (4L) t(v)) AS bc""".stripMargin)
      .head()
    val hs = r.getSeq[Long](0)
    assert(hs.length == 2 && hs == hs.sorted)
    // hashes equal the dual-PolyHash of the gram strings
    val want = Seq("x y z", "y z w").map { g =>
      val h31 = g.foldLeft(0L)((h, c) => (h * 31 + c) % 2147483647L)
      val h131 = g.foldLeft(0L)((h, c) => (h * 131 + c) % 2147483647L)
      h31 | (h131 << 31)
    }.sorted
    assert(hs == want)
    assert(r.getSeq[Long](1).length == 3, "bounded_collect caps at limit")
  }

  test("frequent_words from SQL") {
    val cands = spark.sql(
      """SELECT frequent_words(w, 2) FROM VALUES
        |  ('a'), ('a'), ('a'), ('b'), ('b'), ('c'), ('d') t(w)""".stripMargin)
      .head().getSeq[String](0)
    assert(cands.length <= 2)
    assert(cands.contains("a"), s"majority item must survive: $cands")
  }

  test("optimizer rule rewrites HOF dot product to native DotProduct") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    // table-backed input (literal input would constant-fold away)
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
    val df = e.select($"vec_id",
      aggregate(zip_with($"v", $"v", (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("dp"))
    assert(df.queryExecution.optimizedPlan.toString.contains("dot_product"),
      "expected the HOF pattern rewritten to dot_product")
    // rewritten result == native column API result, row for row
    val native = e.select($"vec_id",
      graft.functions.DotProduct($"v", $"v").as("dp"))
    assert(df.orderBy("vec_id").collect().map(_.getDouble(1))
      .sameElements(native.orderBy("vec_id").collect().map(_.getDouble(1))))
    // a deviating pattern (different zero) must NOT be rewritten
    val other = e.select(
      aggregate(zip_with($"v", $"v", (x, y) => x * y),
        lit(1.0), (acc, x) => acc + x).as("dp"))
    assert(!other.queryExecution.optimizedPlan.toString.contains("dot_product"))
  }

  test("SQL poly_hash matches the column API over real data") {
    GraftSession.registerTables(spark, "/root/testdata/sf0.001")
    val viaSql = spark.sql(
      "SELECT doc_id, poly_hash(text) AS h FROM documents ORDER BY doc_id")
      .collect().map(_.getLong(1))
    import org.apache.spark.sql.functions.col
    val viaCol = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), graft.functions.PolyHash(col("text")).as("h"))
      .orderBy("doc_id").collect().map(_.getLong(1))
    assert(viaSql.sameElements(viaCol))
  }
}
