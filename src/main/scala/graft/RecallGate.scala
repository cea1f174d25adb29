package graft

import org.apache.spark.sql.DataFrame

/** Scale-gate recall assertion for the rows-only ANN family (round-10
  * verdict #8): the unit suite gates recall at sf0.01 only, so a
  * routing parameter that degrades with corpus size (bucket widths, LSH
  * plane counts, probe depths) would pass every spec and silently ship
  * garbage at 10×. This main recomputes recall@K against the exact
  * anchors AT THE GATE SCALE — the anchors already compute the true
  * rows, so the marginal cost is one approx run per family — prints one
  * JSON line, and exits non-zero under any family floor (the same
  * floors SimilaritySpec pins at sf0.01: IVF 0.9, LSH 0.5, PQ 0.7,
  * IVF+PQ 0.6, knn_graph 0.8).
  *
  * Usage: `graft.RecallGate <sfDir>` — the sf1/sf10 gate scripts run it
  * between the oracle compare and the bench phase.
  */
object RecallGate {
  private def sets(df: DataFrame): Map[Long, Set[Long]] =
    df.collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  private def recallOf(exact: Map[Long, Set[Long]],
      approx: Map[Long, Set[Long]]): Double = {
    // a malformed/empty sf dir must fail loudly as a data-shape error,
    // not surface as NaN recall masquerading as a floor violation
    require(exact.nonEmpty, "empty exact anchor set — malformed sf dir?")
    exact.map { case (q, ns) =>
      ns.intersect(approx.getOrElse(q, Set.empty)).size.toDouble / ns.size
    }.sum / exact.size
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.local()
    val S = operators.Similarity
    val exact = sets(S.annBruteForce(spark, sfDir))
    val families: Seq[(String, Double, () => Double)] = Seq(
      ("ann_ivf", 0.9, () => recallOf(exact, sets(S.annIvf(spark, sfDir)))),
      ("ann_lsh", 0.5, () => recallOf(exact, sets(S.annLsh(spark, sfDir)))),
      ("ann_pq", 0.7, () => recallOf(exact, sets(S.annPq(spark, sfDir)))),
      ("ann_ivf_pq", 0.6,
        () => recallOf(exact, sets(S.annIvfPq(spark, sfDir)))),
      ("knn_graph", 0.8, () => {
        val anchor = sets(S.knnGraphExact(spark, sfDir))
        val approx = sets(S.knnGraph(spark, sfDir)
          .filter(s"q_id < ${S.KnnNodes}"))
        recallOf(anchor, approx)
      })) ++ {
      // dedup_embedding_lsh dup-band recall on the clone-closed sample
      // (Dedup.dedupEmbeddingSampleExact): exact is all-pairs on the
      // mod-2000 residue window, approx is the PRODUCTION full-corpus
      // run (corpus-sized planes/tables) restricted to the same window —
      // so the floor exercises the sizing the shipped operator actually
      // uses at this scale. The base (underived) corpora hold no
      // dup-band pairs at all (every sf0.1 pair sits in 0.35..0.6), so
      // an empty anchor skips the entry instead of reporting vacuously.
      val D = operators.Dedup
      val anchor = sets(D.dedupEmbeddingSampleExact(spark, sfDir)
        .filter(s"cosine >= 0.9"))
      if (anchor.isEmpty) {
        System.err.println(
          "dedup_embedding_lsh: no dup-band pairs in the anchor sample " +
            "(base corpus?) — entry skipped")
        Seq.empty
      } else Seq(("dedup_embedding_lsh", 0.8, () => {
        val approx = sets(D.dedupEmbeddingLsh(spark, sfDir)
          .filter(s"a_id % ${D.SampleMod} < ${D.SampleKeep} AND " +
            s"b_id % ${D.SampleMod} < ${D.SampleKeep} AND cosine >= 0.9"))
        recallOf(anchor, approx)
      }))
    }
    val results = families.map { case (name, floor, f) =>
      val r = f()
      (name, floor, r, r >= floor)
    }
    val json = results.map { case (n, floor, r, ok) =>
      f""""$n":{"recall":$r%.4f,"floor":$floor%.2f,"pass":$ok}"""
    }.mkString("{\"metric\":\"recall_gate\",\"sf_dir\":\"" + sfDir + "\",", ",", "}")
    println(json)
    val failed = results.filterNot(_._4)
    if (failed.nonEmpty) {
      System.err.println(
        s"RECALL FLOOR VIOLATION: ${failed.map(_._1).mkString(", ")}")
      sys.exit(1)
    }
  }
}
