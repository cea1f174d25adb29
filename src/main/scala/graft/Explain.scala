package graft

/** Plan-audit utility: prints the physical plan of named registry
  * queries (all of them with no name args) so shuffle/broadcast/codegen
  * shape can be reviewed without attaching a debugger.
  *
  *   sbt "runMain graft.Explain /root/testdata/sf0.001 lm_score dedup_spans"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names =
      if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.local()
    try names.foreach { q =>
      println(s"===== $q =====")
      SparkEntry.queries(q)(spark, dir).explain("formatted")
    } finally spark.stop()
  }
}
