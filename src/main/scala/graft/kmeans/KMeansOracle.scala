package graft.kmeans

/** DuckDB SQL generator mirroring [[KMeans]] semantics, so the driver's
  * oracle can verify the iterative algorithm (SURVEY.md §5). The SQL is
  * built from the same structural pieces the Spark plan uses: top-K init,
  * argmin assignment with smaller-id tie-break, per-cluster mean with
  * empty-cluster coalesce.
  */
object KMeansOracle {

  /** CTE producing `c{n}(cid, x, y)` = centroids after `n` Lloyd
    * iterations over `pts(pid, x, y)`, with `c0` = deterministic init.
    *
    * Each iteration's centroids are rounded to 4 decimals AT THE CHAIN
    * BOUNDARY (not just in the final SELECT): Spark's partial-agg
    * summation order differs from DuckDB's sequential scan, so unrounded
    * means differ in the last float bits — enough to flip the assignment
    * of a point sitting exactly on a Voronoi boundary in a later
    * iteration. Rounding both engines to the contract precision at every
    * boundary makes the fixed point order-insensitive. The Spark twin
    * ([[KMeansQueries.iterated]]) rounds identically. */
  def centroidChain(pointsSql: String, k: Int, iters: Int): String = {
    // pids need not be unique (the testdata has duplicate rows), so the
    // assignment must be per point ROW. K is known at generation time,
    // so the K centroids are PIVOTED into one wide row (cp{i}: x1..xK,
    // y1..yK) cross-joined in, and the argmin is pure vectorized scalar
    // arithmetic: d1..dK inline, `least(d1..dK)` for the minimum, and a
    // first-match CASE chain for the id — `least` returns one of its
    // inputs bitwise, so `CASE WHEN d1 = md THEN 1 WHEN d2 = md ...`
    // picks the SMALLEST cid among exact ties, the contract tie-break.
    // Two rejected forms, both computing identical rows: a LATERAL
    // `ORDER BY dist LIMIT 1` (DuckDB flattens the dependent join into
    // a points×K materialization per stage — at sf1 the 70-stage fit
    // chain spilled >80 GB of temp and died on disk) and a
    // list-of-structs lambda argmin (no spill, but per-row struct
    // allocation ran the sf1 pair past 90 CPU-minutes). The pivoted
    // scalar form was verified row-identical to both on sf0.01 before
    // the switch. Same distance expression, same operand order, so the
    // doubles are bit-identical across all three forms. init ordering
    // includes (x, y) so ties on pid stay deterministic across engines.
    // pts and every c{i} are referenced several times (c{i} by the next
    // assignment, the next coalesce, and — in the fitTrace chain — the
    // convergence flags and the final union); MATERIALIZED stops DuckDB
    // from INLINING them per reference, which on a deep chain expands
    // exponentially (a 30-iteration fitTrace chain exhausted a 20k fd
    // limit re-opening the parquet before the hint).
    // ptsw = the distinct-point sufficient statistics (x, y, multiplicity):
    // Lloyd iterations only ever read (x, y), so every stage runs over the
    // distinct domain and the means/counts are weighted — sum(x·w)/sum(w)
    // equals the row-level mean up to summation-order float noise, which
    // the per-boundary round(·, 4) already absorbs (the same noise class
    // as the Spark-vs-DuckDB order difference this chain was built
    // around). The point: DuckDB's cross-product operator retains the
    // points-side collection PER STAGE for the query's lifetime
    // (measured: 70 stages × raw pts ≈ 10 GB at sf1 / ~100 GB at sf10 —
    // the round-12 kmeans spill-poisoning), and the distinct domain is
    // 100× smaller at sf10 (599,646 vs 60 M rows — replicated corpora
    // repeat values), so the whole chain's retention fits in memory.
    val init =
      s"""pts AS MATERIALIZED ($pointsSql),
         |ptsw AS MATERIALIZED (
         |  SELECT x, y, count(*) AS w FROM pts GROUP BY x, y),
         |c0 AS MATERIALIZED (
         |  SELECT CAST(row_number() OVER (ORDER BY pid, x, y) AS INT) AS cid, x, y
         |  FROM (SELECT pid, x, y FROM pts ORDER BY pid, x, y LIMIT $k))""".stripMargin
    val steps = (1 to iters).map { i =>
      val prev = s"c${i - 1}"
      s"""cp$i AS (${pivotK(prev, k)}),
         |a$i AS (
         |${argminK(s"cp$i", k)}),
         |m$i AS (
         |  SELECT cid, sum(x * w) / sum(w) AS ax, sum(y * w) / sum(w) AS ay,
         |    CAST(sum(w) AS BIGINT) AS n
         |  FROM a$i GROUP BY cid),
         |c$i AS MATERIALIZED (
         |  SELECT i.cid, round(coalesce(m.ax, i.x), 4) AS x,
         |    round(coalesce(m.ay, i.y), 4) AS y
         |  FROM $prev i LEFT JOIN m$i m USING (cid))""".stripMargin
    }
    (init +: steps).mkString(",\n")
  }

  /** One-row pivot of `src(cid, x, y)` — cids are exactly 1..k by
    * construction (row_number init, preserved by every boundary's LEFT
    * JOIN) — into columns x1..xk / y1..yk. */
  private def pivotK(src: String, k: Int): String =
    "SELECT " + (1 to k).map(j =>
      s"max(CASE WHEN cid = $j THEN x END) AS x$j, " +
        s"max(CASE WHEN cid = $j THEN y END) AS y$j").mkString(", ") +
      s" FROM $src"

  /** Per-point-row nearest-centroid pick against the pivoted one-row
    * centroid CTE `cp`: inline d1..dk, `least` for the minimum, and a
    * first-match CASE chain for the id (`least` returns one of its
    * inputs bitwise, so exact distance ties resolve to the smallest
    * cid — the contract tie-break). Emits rows (x, y, cid).
    *
    * Runs over [[centroidChain]]'s distinct-domain `ptsw` (see there)
    * and carries the multiplicity `w` for the weighted consumers.
    * Rejected alternates for the one-row attach, all measured at sf1:
    * the plain cross product retains a points-sized collection per
    * stage (70 × pts ≈ 10 GB spill); a hash join on a constant key
    * hashes the ENTIRE points side into one unspillable bucket (OOM at
    * 8 GB in 13 s); scalar subqueries per pivot column hit the DuckDB
    * 1.0 binder ("alias referenced in a SELECT clause with a
    * subquery"). The distinct-domain cross product keeps the retained
    * side at |distinct(x,y)| rows — 600k at sf10, memory-trivial. */
  private def argminK(cp: String, k: Int): String = {
    val ds = (1 to k).map(j =>
      s"(p.x-cp.x$j)*(p.x-cp.x$j)+(p.y-cp.y$j)*(p.y-cp.y$j) AS d$j")
      .mkString(",\n      ")
    val md = (1 to k).map(j => s"d$j").mkString(", ")
    val cid = (1 to k).map(j => s"WHEN d$j = md THEN $j").mkString(" ")
    s"""  SELECT x, y, w, CAST(CASE $cid END AS INT) AS cid FROM (
       |    SELECT p.x, p.y, p.w,
       |      $ds,
       |      least($md) AS md
       |    FROM ptsw p, $cp cp)""".stripMargin
  }

  def initSql(pointsSql: String, k: Int): String =
    s"""WITH ${centroidChain(pointsSql, k, 0)}
       |SELECT cid, round(x, 4) AS x, round(y, 4) AS y FROM c0 ORDER BY cid""".stripMargin

  /** Per-cluster assignment counts after one map phase on the init
    * centroids. */
  def assignSql(pointsSql: String, k: Int): String =
    s"""WITH ${centroidChain(pointsSql, k, 1)}
       |SELECT cid, n AS n_points, round(ax, 4) AS mean_x, round(ay, 4) AS mean_y
       |FROM m1 ORDER BY cid""".stripMargin

  /** Centroids after `iters` full Lloyd iterations. */
  def iterSql(pointsSql: String, k: Int, iters: Int): String =
    s"""WITH ${centroidChain(pointsSql, k, iters)}
       |SELECT cid, round(x, 4) AS x, round(y, 4) AS y FROM c$iters ORDER BY cid""".stripMargin

  /** The full convergence loop, statically unrolled ([[KMeansQueries
    * .fitTrace]]'s oracle): the chain runs to `cap` iterations, each
    * boundary gets a convergence flag (the reference's allclose test,
    * |Δ| ≤ atol + rtol·|new| with atol=1e-4/rtol=1e-5, evaluated over
    * the ROUNDED chain in exact integer ten-thousandths scaled by 10⁵
    * — the same BIGINT inequality the Spark driver loop evaluates),
    * and the final select picks the centroids at the FIRST converged
    * iteration (or `cap` if none), with the iteration number and flag
    * as columns. Static SQL encodes a dynamic stopping point — the
    * unrolled stages past the fixpoint are evaluated by DuckDB but
    * don't affect the picked rows. */
  def fitTraceSql(pointsSql: String, k: Int, cap: Int): String =
    s"""WITH ${tracePieces(pointsSql, k, cap)}
       |SELECT cid, round(x, 4) AS x, round(y, 4) AS y,
       |  CAST(n AS INT) AS n_iter, converged
       |FROM sel ORDER BY cid""".stripMargin

  /** [[KMeansQueries.fit]]'s oracle — the [[fitTraceSql]] pieces plus
    * the model's cluster sizes: one final list-argmin assignment of
    * every point to the picked (converged) centroids, counted per cid —
    * the same extra pass the Spark query runs after its shared
    * [[KMeans.fitLoop]] core. Empty clusters keep size 0 via the LEFT
    * JOIN coalesce, mirroring the Spark side's getOrElse(0). */
  def fitSql(pointsSql: String, k: Int, cap: Int): String =
    s"""WITH ${tracePieces(pointsSql, k, cap)},
       |selp AS (${pivotK("sel", k)}),
       |fa AS (
       |  SELECT cid, CAST(sum(w) AS BIGINT) AS n FROM (
       |${argminK("selp", k)})
       |  GROUP BY cid)
       |SELECT s.cid, round(s.x, 4) AS x, round(s.y, 4) AS y,
       |  CAST(coalesce(f.n, 0) AS BIGINT) AS size,
       |  CAST(s.n AS INT) AS n_iter, s.converged AS converged
       |FROM sel s LEFT JOIN fa f USING (cid) ORDER BY s.cid""".stripMargin

  /** The convergence-chain WITH-body shared by [[fitTraceSql]] and
    * [[fitSql]]: the `cap`-deep rounded chain, per-boundary allclose
    * flags, the first-converged pick, and `sel(cid, x, y, n, converged)`
    * = the centroids at the picked iteration. `sel` is MATERIALIZED —
    * [[fitSql]] references it twice (the LATERAL argmin and the final
    * select), and an inlining reference would re-expand the whole
    * chain per use (the SNIPPETS fd-exhaustion lesson). */
  private def tracePieces(pointsSql: String, k: Int, cap: Int): String = {
    def c10k(t: String, c: String) = s"CAST(round($t.$c*10000) AS BIGINT)"
    def close(c: String) =
      s"abs(${c10k("p", c)} - ${c10k("c", c)}) * 100000 <= 100000 + abs(${c10k("c", c)})"
    val conv = (1 to cap).map { i =>
      s"""  SELECT $i AS it, bool_and(${close("x")} AND ${close("y")}) AS ok
         |  FROM c${i - 1} p JOIN c$i c USING (cid)""".stripMargin
    }.mkString("\nUNION ALL\n")
    val allc = (1 to cap).map(i =>
      s"  SELECT $i AS it, cid, x, y FROM c$i").mkString("\nUNION ALL\n")
    s"""${centroidChain(pointsSql, k, cap)},
       |conv AS (
       |$conv),
       |pick AS (
       |  SELECT coalesce(min(it), $cap) AS n, count(*) > 0 AS converged
       |  FROM conv WHERE ok),
       |allc AS (
       |$allc),
       |sel AS MATERIALIZED (
       |  SELECT a.cid, a.x, a.y, p.n, p.converged
       |  FROM allc a, pick p WHERE a.it = p.n)""".stripMargin
  }

  /** [[KMeansQueries.silhouette]]'s oracle: the converged contract
    * chain ([[tracePieces]] → `sel`, same as [[fitSql]]), then one
    * scoring pass — squared distances d1..dk inline (operand order
    * matching the Spark expressions), nearest/second-nearest via a
    * sorted list, first-match CASE for the cid tie-break, per-point
    * silhouette rounded to 4 decimals into a DECIMAL sum. */
  def silhouetteSql(pointsSql: String, k: Int, cap: Int): String = {
    val ds = (1 to k).map(j =>
      s"(p.x-cp.x$j)*(p.x-cp.x$j)+(p.y-cp.y$j)*(p.y-cp.y$j) AS d$j")
      .mkString(",\n      ")
    val md = (1 to k).map(j => s"d$j").mkString(", ")
    val cid = (1 to k).map(j => s"WHEN d$j = md THEN $j").mkString(" ")
    s"""WITH ${tracePieces(pointsSql, k, cap)},
       |selp AS (${pivotK("sel", k)}),
       |scored AS (
       |  SELECT CAST(CASE $cid END AS INT) AS cid, w,
       |    sqrt(list_sort([$md])[1]) AS a, sqrt(list_sort([$md])[2]) AS b
       |  FROM (
       |    SELECT p.w,
       |      $ds,
       |      least($md) AS md
       |    FROM ptsw p, selp cp)),
       |agg AS (
       |  SELECT cid, CAST(sum(w) AS BIGINT) AS n,
       |    sum(CAST(round(CASE WHEN b > 0 THEN (b - a) / b ELSE 0.0 END, 4)
       |      AS DECIMAL(20,4)) * w) AS sil
       |  FROM scored GROUP BY cid)
       |SELECT s.cid, CAST(coalesce(g.n, 0) AS BIGINT) AS n_points,
       |  CASE WHEN g.n > 0 THEN round(CAST(g.sil AS DOUBLE) / g.n, 4) END
       |    AS avg_sil
       |FROM sel s LEFT JOIN agg g USING (cid) ORDER BY s.cid""".stripMargin
  }

  /** Mean squared distance to the assigned centroid after one step —
    * weighted over the distinct domain ([[centroidChain]]'s ptsw). */
  def costSql(pointsSql: String, k: Int): String =
    s"""WITH ${centroidChain(pointsSql, k, 1)}
       |SELECT round(sum(((a.x-c.x)*(a.x-c.x)+(a.y-c.y)*(a.y-c.y)) * a.w)
       |    / sum(a.w), 4) AS mean_sq_dist,
       |  CAST(sum(a.w) AS BIGINT) AS n_points
       |FROM a1 a JOIN c0 c USING (cid)""".stripMargin
}
