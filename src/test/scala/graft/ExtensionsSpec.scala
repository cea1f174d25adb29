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
        |  dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dp""".stripMargin)
      .head()
    assert(r.getLong(0) == 'a'.toLong)
    assert(r.getLong(1) == 'a'.toLong)
    assert(r.getSeq[String](2) == Seq("x y z", "y z w"))
    assert(r.getLong(3) >= 0L)
    assert(r.getDouble(4) == 11.0)
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
