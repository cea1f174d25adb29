package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Measures the CROSSED-cap dedup_embedding regime at real volume — the
  * round-5 verdict's one `weak`: `HotBlockCap` bounded the quadratic but
  * the LSH-routed hot arm had only ever executed in a cap=10 spec, so
  * neither its wall time nor its recall was a measurement.
  *
  * Workload: the sf0.1 embeddings replicated [[Replicas]]× — ONE label
  * ([[HotLabel]]) keeps its label across replicas and grows into a
  * 21,800-row hot block (> HotBlockCap = 20,000), every other label is
  * re-labeled per replica so its blocks stay at natural sf0.1 size
  * (≤ 218). Replica vectors get one coordinate perturbed by r·10⁻³ —
  * near-identical but NOT identical, so bucket collisions are earned by
  * the hyperplanes rather than guaranteed by bit-equality (the sf1
  * replica-identical artifact the round-5 verdict called out). This is
  * the verdict's "sf1 variant with one label forced over HotBlockCap":
  * the hot block crosses the cap at real volume while the exact
  * baseline stays computable (hot 21,800²/2 ≈ 2.4·10⁸ comparisons —
  * exactly the per-block budget the cap implies, so timing it IS the
  * budget measurement).
  *
  * Measures, over [[Sweeps]] alternating runs (min like Bench.scala):
  *   - routed: `dedupEmbedding` with the production cap — cold labels
  *     exact, hot block through the plane-adaptive LSH arm;
  *   - exact: `dedupEmbeddingAllPairs` — the uncapped quadratic;
  *   - recall of the routed hot-block pairs vs the exact hot-block
  *     pairs (precision is 1.0 by the shared verify — asserted via an
  *     empty anti-join, not assumed);
  *   - the measured pair-verify rate, and the cap a 60-s-per-block
  *     budget implies at that rate: cap = ⌊√(2·60·rate)⌋.
  *
  * Emits one JSON line and writes HOTBLOCK_BENCH.json to the repo root.
  * Usage: `sbt "Test/runMain graft.HotBlockBench [srcDir] [outDir]"`
  * (defaults /root/testdata/sf0.1 → /tmp/sfhot). Deterministic — no RNG.
  */
object HotBlockBench {
  val Replicas = 100
  val HotLabel = 2
  val Sweeps = 2
  val BudgetSecPerBlock = 60.0

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.drop(1).headOption.getOrElse("/tmp/sfhot")
    val spark = GraftSession.local()
    import spark.implicits._

    if (!Files.exists(Paths.get(s"$out/embeddings.parquet")))
      generate(spark, src, out)

    def timed(run: => Unit): Double = {
      val t0 = System.nanoTime(); run; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def dump(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$name")

    // sample 1 doubles as the pair-set materialization (parquet write
    // instead of noop — the recall stage then reads the dumps instead
    // of re-executing two ~16-minute plans); later samples are pure
    // noop steady-state. min per arm, Bench.scala's protocol.
    val (routedTimes, exactTimes) = (Array.ofDim[Double](Sweeps), Array.ofDim[Double](Sweeps))
    for (i <- 0 until Sweeps) {
      routedTimes(i) = timed {
        if (i == 0) dump(Dedup.dedupEmbedding(spark, out), "_routed")
        else noop(Dedup.dedupEmbedding(spark, out))
      }
      exactTimes(i) = timed {
        if (i == 0) dump(Dedup.dedupEmbeddingAllPairs(spark, out), "_exact")
        else noop(Dedup.dedupEmbeddingAllPairs(spark, out))
      }
      println(f"[hotbench] sweep ${i + 1}: routed ${routedTimes(i)}%.1f s, exact ${exactTimes(i)}%.1f s")
    }

    // recall on the hot block, BANDED by the exact pair's cosine: the
    // overall number is dominated by barely-over-threshold pairs, but
    // the pairs a dedup exists to catch are the high-cosine ones — the
    // bands make the hot-arm trade measurable instead of averaged away.
    // routed ⊆ exact (shared verify ⇒ precision 1.0 — asserted).
    val labels = spark.read.parquet(s"$out/embeddings.parquet")
      .select($"vec_id".as("a_id"), $"label")
    def hotPairs(name: String): DataFrame =
      spark.read.parquet(s"$out/$name").join(labels, "a_id")
        .filter($"label" === HotLabel).select($"a_id", $"b_id", $"cosine")
    val routedHot = hotPairs("_routed").cache()
    val exactHot = hotPairs("_exact").cache()
    val (nRouted, nExact) = (routedHot.count(), exactHot.count())
    val leaked = routedHot.join(exactHot, Seq("a_id", "b_id"), "left_anti").count()
    require(leaked == 0, s"precision violated: $leaked routed hot pairs not in exact")
    def recallAtLeast(tau: Double): Double = {
      val ex = exactHot.filter($"cosine" >= tau)
      val hit = ex.join(routedHot.select($"a_id", $"b_id"),
        Seq("a_id", "b_id"), "left_semi").count()
      hit.toDouble / math.max(ex.count(), 1L)
    }
    val recall = nRouted.toDouble / nExact
    val (recall60, recall90) = (recallAtLeast(0.6), recallAtLeast(0.9))

    // pair-verify rate from the exact run → cap for a 60-s block budget
    val pairsExact = spark.read.parquet(s"$out/embeddings.parquet")
      .groupBy($"label").agg(count(lit(1)).as("bn"))
      .agg(sum($"bn" * ($"bn" - 1) / 2)).head().getDouble(0)
    val rate = pairsExact / exactTimes.min
    val capFor60s = math.sqrt(2.0 * BudgetSecPerBlock * rate).toLong

    val json =
      f"""{"workload":"sf0.1 x$Replicas%d, one hot label","hot_block_rows":${Replicas * 218}%d,
         |"hot_block_cap":${Dedup.HotBlockCap}%d,"routed_sec":${routedTimes.min}%.1f,
         |"exact_sec":${exactTimes.min}%.1f,"speedup":${exactTimes.min / routedTimes.min}%.2f,
         |"recall_hot":$recall%.4f,"recall_cos60":$recall60%.4f,"recall_cos90":$recall90%.4f,
         |"routed_hot_pairs":$nRouted%d,"exact_hot_pairs":$nExact%d,
         |"pairs_exact_total":${pairsExact.toLong}%d,"rate_pairs_per_sec":${rate.toLong}%d,
         |"cap_for_60s_block":$capFor60s%d}""".stripMargin.replaceAll("\n", "")
    println(s"[hotbench] $json")
    Files.write(Paths.get("HOTBLOCK_BENCH.json"), (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }

  /** Writes the one-hot-label replicated embeddings table (see object
    * scaladoc). Replica 0 is the source data verbatim; replica r > 0
    * shifts vec_id by r·span, re-labels cold rows to label·1000 + r,
    * and perturbs coordinate (r mod 64) by r·10⁻³. */
  def generate(spark: SparkSession, src: String, out: String): Unit = {
    import spark.implicits._
    val emb = Tables(spark, src, "embeddings")
    val vSpan = emb.agg(max($"vec_id".cast("long"))).head().getLong(0) + 1L
    val replicas = (0 until Replicas).map { r =>
      if (r == 0) emb.select($"vec_id", $"embedding", $"label")
      else emb.select(
        ($"vec_id" + lit(vSpan * r)).as("vec_id"),
        transform($"embedding", (x, i) =>
          when(i === lit(r % 64), (x + lit((r * 0.001).toFloat)).cast("float"))
            .otherwise(x)).as("embedding"),
        when($"label" === HotLabel, lit(HotLabel))
          .otherwise($"label" * 1000 + r).as("label"))
    }.reduce(_ unionByName _)
    Files.createDirectories(Paths.get(out))
    val tmp = s"$out/_tmp_embeddings"
    replicas.coalesce(1).write.mode("overwrite").parquet(tmp)
    val partFile = Files.list(Paths.get(tmp))
      .filter(_.toString.endsWith(".parquet")).findFirst()
      .orElseThrow(() => new IllegalStateException(s"no part file in $tmp"))
    Files.move(partFile, Paths.get(s"$out/embeddings.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    Files.walk(Paths.get(tmp)).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.deleteIfExists(p))
    println(s"[hotbench] generated $out/embeddings.parquet")
  }
}
