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
    // assignment is a per-row LATERAL argmin, not a row_number-per-pid
    // trick; init ordering includes (x, y) so ties on pid stay
    // deterministic across engines.
    // pts and every c{i} are referenced several times (c{i} by the next
    // assignment, the next coalesce, and — in the fitTrace chain — the
    // convergence flags and the final union); MATERIALIZED stops DuckDB
    // from INLINING them per reference, which on a deep chain expands
    // exponentially (a 30-iteration fitTrace chain exhausted a 20k fd
    // limit re-opening the parquet before the hint).
    val init =
      s"""pts AS MATERIALIZED ($pointsSql),
         |c0 AS MATERIALIZED (
         |  SELECT CAST(row_number() OVER (ORDER BY pid, x, y) AS INT) AS cid, x, y
         |  FROM (SELECT pid, x, y FROM pts ORDER BY pid, x, y LIMIT $k))""".stripMargin
    val steps = (1 to iters).map { i =>
      val prev = s"c${i - 1}"
      s"""a$i AS (
         |  SELECT p.x, p.y, l.cid FROM pts p, LATERAL (
         |    SELECT c.cid FROM $prev c
         |    ORDER BY (p.x-c.x)*(p.x-c.x)+(p.y-c.y)*(p.y-c.y), c.cid
         |    LIMIT 1) l),
         |m$i AS (
         |  SELECT cid, avg(x) AS ax, avg(y) AS ay, count(*) AS n
         |  FROM a$i GROUP BY cid),
         |c$i AS MATERIALIZED (
         |  SELECT i.cid, round(coalesce(m.ax, i.x), 4) AS x,
         |    round(coalesce(m.ay, i.y), 4) AS y
         |  FROM $prev i LEFT JOIN m$i m USING (cid))""".stripMargin
    }
    (init +: steps).mkString(",\n")
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
    * the model's cluster sizes: one final LATERAL-argmin assignment of
    * every point to the picked (converged) centroids, counted per cid —
    * the same extra pass the Spark query runs after its shared
    * [[KMeans.fitLoop]] core. Empty clusters keep size 0 via the LEFT
    * JOIN coalesce, mirroring the Spark side's getOrElse(0). */
  def fitSql(pointsSql: String, k: Int, cap: Int): String =
    s"""WITH ${tracePieces(pointsSql, k, cap)},
       |fa AS (
       |  SELECT l.cid, count(*) AS n FROM pts p, LATERAL (
       |    SELECT c.cid FROM sel c
       |    ORDER BY (p.x-c.x)*(p.x-c.x)+(p.y-c.y)*(p.y-c.y), c.cid
       |    LIMIT 1) l GROUP BY l.cid)
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

  /** Mean squared distance to the assigned centroid after one step. */
  def costSql(pointsSql: String, k: Int): String =
    s"""WITH ${centroidChain(pointsSql, k, 1)}
       |SELECT round(avg((a.x-c.x)*(a.x-c.x)+(a.y-c.y)*(a.y-c.y)), 4) AS mean_sq_dist,
       |  count(*) AS n_points
       |FROM a1 a JOIN c0 c USING (cid)""".stripMargin
}
