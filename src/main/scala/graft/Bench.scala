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
  *
  * Timing protocol: [[Sweeps]] full passes over the suite, reporting
  * each query's MIN with its observed max−min `spread` alongside —
  * host timings here swing ±20% run to run (documented across rounds),
  * so a single sample cannot distinguish a regression from noise; the
  * min approximates steady-state throughput and the spread makes the
  * noise floor part of the artifact, so regressions are decidable from
  * the JSON alone. Sweep 1 additionally pays each plan's one-time cost
  * (codegen compile, AQE canonicalization).
  *
  * The shared near-dup pair stage ([[operators.Dedup.ngramPairs]]) is
  * cleared once per SWEEP, not per query: within a sweep the first
  * dedup-family query prices the build and the rest reuse it — the
  * accounting a real pipeline run has — while the next sweep starts
  * cold again. */
object Bench {
  val Sweeps = 3

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    // Untimed warmup: JVM/codegen/parquet-footer costs land here, not on
    // the alphabetically-first query.
    try SparkEntry.queries("q1_agg")(spark, sfDir)
      .write.mode("overwrite").format("noop").save()
    catch { case _: Throwable => }
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
    val times = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    for (_ <- 1 to Sweeps) {
      operators.Dedup.clearPairCache()
      names.foreach { case (name, fn) =>
        // settle GC debt from earlier queries so it isn't billed here
        System.gc()
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
          }
        // a failed run records -1, never its time-to-exception — a
        // breakage must not read as a speedup in the JSON line
        times(name) = times(name) :+ (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
      }
    }
    val results = names.map { case (name, _) =>
      val ts = times(name)
      if (ts.contains(-1.0)) (name, -1.0, -1.0)
      else (name, ts.min, ts.max - ts.min)
    }
    def obj(f: (String, Double, Double) => Double): String =
      results.map { case (k, mn, sp) => "\"" + k + f"""":${f(k, mn, sp)}%.3f""" }
        .mkString("{", ",", "}")
    val qs = obj((_, mn, _) => mn)
    val spreads = obj((_, _, sp) => sp)
    // failed queries report -1 in `queries` but are EXCLUDED from the
    // total (summing the sentinel would make a breakage read as a
    // speedup); the explicit count makes a partial run unmistakable
    val total = results.collect { case (_, v, _) if v >= 0 => v }.sum
    val failed = results.count(_._2 < 0)
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"spread":$spreads,"sweeps":$Sweeps,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
