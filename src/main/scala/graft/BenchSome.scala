package graft

/** Subset benchmark for iterating on individual operators without
  * paying a full [[Bench]] suite run: `runMain graft.BenchSome q1_agg
  * kmeans_train_build er_link_build` times just the named entries
  * (same noop-write protocol, same build-stage pseudo-entries as
  * [[Bench]]) for [[Bench.Sweeps]] sweeps against SPARK_GRAFT_SF_DIR
  * and prints one JSON line. A tuning loop reads this; the committed
  * BENCH artifacts always come from the full [[Bench]]. */
object BenchSome {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    val builds: Map[String, () => Unit] = Map(
      "dedup_pairs_build" -> (() => {
        operators.Dedup.clearPairCache(); operators.Dedup.ngramPairs(spark, sfDir); ()
      }),
      "ann_train_build" -> (() => {
        operators.Similarity.clearTrainCache(); operators.Similarity.trainAnn(spark, sfDir)
      }),
      "kmeans_train_build" -> (() => {
        kmeans.KMeansQueries.clearFitCache(); kmeans.KMeansQueries.trainFit(spark, sfDir)
      }),
      "er_link_build" -> (() => {
        operators.EntityResolution.clearLinkCache()
        operators.EntityResolution.linkBuild(spark, sfDir)
      }),
      "dsir_train_build" -> (() => {
        operators.DataSelection.clearTrainCache()
        operators.DataSelection.trainWeights(spark, sfDir); ()
      }),
      "dsir_score_build" -> (() => {
        operators.DataSelection.clearScoreCache()
        operators.DataSelection.trainScored(spark, sfDir); ()
      }),
      "lm_score_build" -> (() => {
        operators.LangModel.clearScoreCache()
        operators.LangModel.trainScores(spark, sfDir); ()
      }),
      "quality_score_build" -> (() => {
        operators.TextAnalysis.clearScoreCache()
        operators.TextAnalysis.trainQualityScores(spark, sfDir); ()
      }),
      "bpe_train_build" -> (() => {
        operators.TextAnalysis.clearBpeCache()
        operators.TextAnalysis.trainBpe(spark, sfDir); ()
      }))
    // dedupe: a repeated arg would double-count its sweeps. Sweeps >= 1
    // is enforced by Bench.Sweeps' own initializer (referencing it at
    // all throws on a bad GRAFT_BENCH_SWEEPS), so no re-check here —
    // the time vectors below can never be empty.
    val names = (if (args.nonEmpty) args.toSeq else Seq("q1_agg")).distinct
    val unknown = names.filterNot(n => builds.contains(n) || SparkEntry.queries.contains(n))
    require(unknown.isEmpty, s"unknown entries: ${unknown.mkString(",")}")
    val times = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    for (sweep <- 0 to Bench.Sweeps) { // sweep 0 = untimed warmup
      names.foreach { name =>
        System.gc()
        val t0 = System.nanoTime()
        builds.get(name) match {
          case Some(b) => b()
          case None =>
            SparkEntry.queries(name)(spark, sfDir)
              .write.mode("overwrite").format("noop").save()
        }
        if (sweep > 0)
          times(name) = times(name) :+ (System.nanoTime() - t0) / 1e9
      }
    }
    val line = names.map { n =>
      val ts = times(n)
      f""""$n":{"min":${ts.min}%.3f,"spread":${ts.max - ts.min}%.3f}"""
    }.mkString("{", ",", "}")
    spark.stop()
    println(line)
  }
}
