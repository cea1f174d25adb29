package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, one JSON line to stdout (BENCH_r{N}.json).
  *
  * Queries are forced through a `noop`-format write so the FULL plan
  * executes (a bare `count()` would let Catalyst prune projections and
  * under-report the work). AQE is on — it coalesces the post-shuffle
  * partitions the sf0.1 data doesn't need and re-plans skewed joins, the
  * same configuration a production cluster would run.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    // Untimed warmup: JVM/codegen/parquet-footer costs land here, not on
    // the alphabetically-first query.
    try SparkEntry.queries("q1_agg")(spark, sfDir)
      .write.mode("overwrite").format("noop").save()
    catch { case _: Throwable => }
    // Two timed runs per query, report the min: run 1 pays the one-time
    // per-plan cost (codegen compile, AQE canonicalization) and absorbs
    // transient host noise; the min is the steady-state throughput a
    // long-running cluster job sees.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // settle GC debt from earlier queries so it isn't billed to this one
      System.gc()
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
          }
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }
      // a failed query reports -1, never its time-to-exception — a
      // breakage must not read as a speedup in the JSON line
      name -> (if (times.contains(-1.0)) -1.0 else times.min)
    }
    val qs = results.map { case (k, v) => "\"" + k + f"""":$v%.3f""" }
      .mkString("{", ",", "}")
    // failed queries report -1 in `queries` but are EXCLUDED from the
    // total (summing the sentinel would make a breakage read as a
    // speedup); the explicit count makes a partial run unmistakable
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val failed = results.count(_._2 < 0)
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
