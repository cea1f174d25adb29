package graft

import org.apache.spark.sql.functions._

/** Stage timer for the span pipeline (measurement surface, like
  * [[HotBlockBench]] — never a registered query):
  *
  *   sbt "Test/runMain graft.SpanProfile [sfDir]"
  */
object SpanProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local()
    import spark.implicits._
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[spanprofile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = Tables(spark, dir, "documents")
    // warm the scan + codegen
    t("warmup count")(docs.count())
    val g = docs
      .select($"doc_id",
        posexplode(graft.functions.WordNgramHashes.positional($"text", 8)))
      .select(($"doc_id" * lit(1L << 21) + ($"pos" + 1)).as("pk"),
        $"col".as("gh"))
    t("grams (hash+pack)")(g.write.mode("overwrite").format("noop").save())
    val agg = g.groupBy($"gh")
      .agg(graft.functions.BoundedCollect($"pk", 65).as("pks"),
        count(lit(1)).as("occ"), min($"pk").as("mnpk"), max($"pk").as("mxpk"))
    t("postings agg")(agg.write.mode("overwrite").format("noop").save())
    t("full dedup_spans x2: 1st")(
      operators.Dedup.dedupSpans(spark, dir).write.mode("overwrite")
        .format("noop").save())
    t("full dedup_spans x2: 2nd")(
      operators.Dedup.dedupSpans(spark, dir).write.mode("overwrite")
        .format("noop").save())
    t("full span_redact")(
      operators.Dedup.spanRedact(spark, dir).write.mode("overwrite")
        .format("noop").save())
    spark.stop()
  }
}
