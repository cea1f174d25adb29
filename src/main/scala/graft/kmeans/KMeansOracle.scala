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
    val init =
      s"""pts AS ($pointsSql),
         |c0 AS (
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
         |c$i AS (
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

  /** Mean squared distance to the assigned centroid after one step. */
  def costSql(pointsSql: String, k: Int): String =
    s"""WITH ${centroidChain(pointsSql, k, 1)}
       |SELECT round(avg((a.x-c.x)*(a.x-c.x)+(a.y-c.y)*(a.y-c.y)), 4) AS mean_sq_dist,
       |  count(*) AS n_points
       |FROM a1 a JOIN c0 c USING (cid)""".stripMargin
}
