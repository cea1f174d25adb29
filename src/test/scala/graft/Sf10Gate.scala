package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** The two-decades-up scale gate (round-6 verdict item 2): derive
  * /tmp/sf10 (100× the bench scale) and run the embedding-dedup family
  * where the NATURAL label blocks cross `HotBlockCap` — the standard
  * workload, not HotBlockBench's synthetic one-hot-label one, now
  * exercises the LSH-routed regime end to end.
  *
  * Why sf10 crosses naturally: sf0.1 has 2,000 vectors over 10 labels
  * (≤ 218/block); two key-offset decades ([[ScaleUp]] twice) give
  * 200,000 vectors with labels UNCHANGED → ~20,000-row blocks, 3.3×
  * over the measured cap = every label routes through the
  * plane-adaptive LSH arm.
  *
  * The recall assert is structural, not sampled: each sf0.1 vector has
  * exactly 100 bit-identical replicas (embeddings replicate unchanged,
  * vec_id ≡ base (mod 2000) across both decades), so the planted truth
  * is every within-family pair — Σ_f C(n_f, 2) ≈ 9.9M pairs at cosine
  * exactly 1.0 — and identical vectors share every hyperplane sign, so
  * the routed arm must recover ALL of them; anything below 1.0 is a
  * routing bug, not an approximation trade. Found/expected are counted
  * in-plan (one aggregate over the pair stream; nothing collects).
  *
  * Emits one JSON line and writes SF10_BENCH.json to the repo root.
  * Usage: `sbt "Test/runMain graft.Sf10Gate"`. Deterministic — no RNG.
  */
object Sf10Gate {
  val Sf1Dir = "/tmp/sf1"
  val Sf10Dir = "/tmp/sf10"
  val BaseSpan = 2000L // sf0.1 vec_id key space (max+1), both decades

  def main(args: Array[String]): Unit = {
    if (!Files.exists(Paths.get(s"$Sf1Dir/embeddings.parquet")))
      ScaleUp.main(Array("/root/testdata/sf0.1", Sf1Dir))
    if (!Files.exists(Paths.get(s"$Sf10Dir/embeddings.parquet")))
      ScaleUp.main(Array(Sf1Dir, Sf10Dir))
    val spark = GraftSession.local()
    import spark.implicits._

    val emb = Tables(spark, Sf10Dir, "embeddings")
    val blocks = emb.groupBy($"label").agg(count(lit(1)).as("bn"))
      .agg(max($"bn"), count(lit(1))).head()
    val (maxBlock, nLabels) = (blocks.getLong(0), blocks.getLong(1))
    val nVecs = emb.count()
    require(maxBlock > Dedup.HotBlockCap,
      s"sf10's largest natural block ($maxBlock) must exceed " +
        s"HotBlockCap=${Dedup.HotBlockCap} for this gate to mean anything")

    // planted truth: every within-family pair (families = vec_id mod
    // BaseSpan; replicas are bit-identical ⇒ cosine 1.0 ≥ CosineTau)
    val expected = emb.groupBy(pmod($"vec_id", lit(BaseSpan)).as("base"))
      .agg(count(lit(1)).as("n"))
      .agg(sum(expr("n * (n - 1) DIV 2"))).head().getLong(0)

    def timedCount(df: org.apache.spark.sql.DataFrame): (Double, Long, Long) = {
      val t0 = System.nanoTime()
      val r = df.agg(count(lit(1)),
        count(when(pmod($"a_id", lit(BaseSpan)) === pmod($"b_id", lit(BaseSpan)), 1)))
        .head()
      ((System.nanoTime() - t0) / 1e9, r.getLong(0), r.getLong(1))
    }

    val (tEmb, nEmb, famEmb) = timedCount(Dedup.dedupEmbedding(spark, Sf10Dir))
    val recall = famEmb.toDouble / expected
    val (tSem, nSem, famSem) = timedCount(Dedup.dedupSemantic(spark, Sf10Dir))
    val (tLsh, nLsh, famLsh) = timedCount(Dedup.dedupEmbeddingLsh(spark, Sf10Dir))
    val recallSem = famSem.toDouble / expected
    val recallLsh = famLsh.toDouble / expected

    assert(recall >= 0.9999,
      s"routed dedup_embedding must recover every bit-identical planted " +
        s"pair (got $famEmb/$expected = $recall) — identical vectors " +
        "share every hyperplane sign; a miss is a routing bug")

    val json =
      f"""{"metric":"sf10_gate","n_vecs":$nVecs,"n_labels":$nLabels,""" +
      f""""largest_block":$maxBlock,"hot_block_cap":${Dedup.HotBlockCap},""" +
      f""""planted_pairs":$expected,""" +
      f""""dedup_embedding":{"sec":$tEmb%.1f,"pairs":$nEmb,"planted_found":$famEmb,"recall":$recall%.4f},""" +
      f""""dedup_semantic":{"sec":$tSem%.1f,"pairs":$nSem,"planted_found":$famSem,"recall":$recallSem%.4f},""" +
      f""""dedup_embedding_lsh":{"sec":$tLsh%.1f,"pairs":$nLsh,"planted_found":$famLsh,"recall":$recallLsh%.4f}}"""
    println(json)
    Files.write(Paths.get("SF10_BENCH.json"), (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
