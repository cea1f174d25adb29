package graft.kmeans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.NearestCentroid

/** A centroid — reference `Centroid{id, Point{x, y}}` (mapreduce.proto:12-15),
  * ids 1-based. */
final case class Centroid(id: Int, x: Double, y: Double)

/** Result of a full Lloyd run. `history` is the per-iteration centroid
  * log — the reference's observability surface (dump.txt, written by the
  * master each cycle); entry 0 is the init, entry i the centroids after
  * iteration i. K rows per iteration, so retaining it is free. */
final case class KMeansModel(centroids: Seq[Centroid], sizes: Map[Int, Long],
    iterations: Int, converged: Boolean,
    history: Seq[Seq[Centroid]] = Nil)

/** Spark-native Lloyd's K-Means — the reference engine's whole workload
  * (master.py / mapper.py / reducer.py), re-expressed as a DataFrame plan:
  *
  *   - centroid "broadcast" (master.py:59) = double arrays embedded in a
  *     codegen'd [[NearestCentroid]] expression — no gRPC, no protobuf;
  *   - the mapper's per-reducer partition files + FetchData shuffle
  *     (mapper.py:68-71, reducer.py:19-27) = Spark's hash shuffle under
  *     `groupBy(cid)`, with map-side partial aggregation, so the wire
  *     carries K×partitions partial sums instead of every point;
  *   - the reducer's per-cluster mean (reducer.py:41-51) = `avg(x),avg(y)`;
  *   - the master's retry-forever loop on simulated failures
  *     (master.py:73-89) = Spark task re-execution, natively;
  *   - convergence: `np.allclose(old, new, atol=1e-4)` (master.py:144) =
  *     |old-new| <= atol + rtol*|new| per coordinate, rtol=1e-5 (numpy's
  *     default rtol is retained by the reference).
  *
  * Per-iteration driver traffic is K rows; the scan is a narrow projection
  * of two double columns — at 100 TB the plan is scan + partial-agg +
  * K-row shuffle, nothing else.
  *
  * Deviations from the reference (documented): empty clusters keep their
  * previous centroid (the reference drops the id from the reducer dict and
  * would crash `np.allclose` on shape mismatch, master.py:144); init is
  * deterministic (K smallest point ids via distributed top-K) instead of
  * `random.sample` (master.py:34), so results are reproducible and
  * oracle-checkable. Production alternative: seeded sample / MLlib
  * k-means|| ([[MLlibKMeans]]). Retry semantics deviate FINITELY: the
  * reference master re-queues a failed task forever (master.py:70-89 —
  * a permanently failing mapper hangs the job); Spark re-executes a
  * failed task up to `spark.task.maxFailures` (default 4) and then
  * fails the JOB with the error surfaced — bounded retries are the
  * production-correct choice at 1000 executors, where retry-forever
  * turns one bad record into an invisible infinite loop.
  * FaultToleranceSpec exercises the recovery path.
  */
object KMeans {
  val DefaultAtol = 1e-4
  val DefaultRtol = 1e-5

  /** Deterministic init: the K points smallest by (pid, x, y), ids
    * assigned in that order. pids need not be unique (the x, y tie-break
    * keeps selection deterministic). Distributed top-K
    * (TakeOrderedAndProject) — O(K) memory per partition, no global sort,
    * scales to any input size. */
  def init(points: DataFrame, k: Int): Seq[Centroid] = {
    val rows = points.select("pid", "x", "y")
      .orderBy("pid", "x", "y").limit(k).collect()
    rows.map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      .sorted.zipWithIndex.map { case ((_, x, y), i) =>
        Centroid(i + 1, x, y)
      }.toSeq
  }

  /** Reference-parity seeded init: a pseudo-random K-sample of the
    * points (`random.sample(points, K)`, master.py:27-34), made
    * reproducible AND partitioning-independent by ranking on a 64-bit
    * avalanche mix of (pid, seed) instead of RNG state — every executor
    * computes the same rank for a row no matter which partition it lands
    * in, and the selection is a distributed top-K (O(K) memory per
    * partition, no global sort), so the init scales like [[init]].
    * Centroid ids are 1-based in rank order (the reference numbers its
    * sample 1..K in draw order, master.py:60). */
  def initSample(points: DataFrame, k: Int, seed: Long): Seq[Centroid] = {
    val rows = points.select(col("pid"), col("x"), col("y"))
      .withColumn("__r", xxhash64(col("pid"), col("x"), col("y"), lit(seed)))
      .orderBy(col("__r"), col("pid"), col("x"), col("y"))
      .limit(k).collect()
    rows.zipWithIndex.map { case (r, i) =>
      Centroid(i + 1, r.getDouble(1), r.getDouble(2))
    }.toSeq
  }

  /** Map phase: tag each point with its nearest centroid id. */
  def assign(points: DataFrame, cs: Seq[Centroid]): DataFrame = {
    val cxs = cs.map(_.x).toArray
    val cys = cs.map(_.y).toArray
    points.withColumn("cid", NearestCentroid(col("x"), col("y"), cxs, cys))
  }

  /** One full map-reduce cycle: new centroid = mean of assigned points;
    * empty cluster keeps the old centroid. Returns (centroids, sizes). */
  def step(points: DataFrame, cs: Seq[Centroid]): (Seq[Centroid], Map[Int, Long]) = {
    val means = assign(points, cs)
      .groupBy("cid")
      .agg(avg("x").as("ax"), avg("y").as("ay"), count(lit(1)).as("n"))
      .collect()
      .map(r => r.getInt(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3))))
      .toMap
    val next = cs.map { c =>
      means.get(c.id) match {
        case Some((ax, ay, _)) => Centroid(c.id, ax, ay)
        case None => c
      }
    }
    (next, cs.map(c => c.id -> means.get(c.id).map(_._3).getOrElse(0L)).toMap)
  }

  def converged(old: Seq[Centroid], next: Seq[Centroid],
      atol: Double = DefaultAtol, rtol: Double = DefaultRtol): Boolean =
    old.zip(next).forall { case (a, b) =>
      math.abs(a.x - b.x) <= atol + rtol * math.abs(b.x) &&
      math.abs(a.y - b.y) <= atol + rtol * math.abs(b.y)
    }

  /** The master's iteration loop (master.py:138-150) over the RAW
    * double chain — delegates to [[fitLoop]], the ONE loop definition
    * shared with the contract-chain twin ([[KMeansQueries.fitTrace]] /
    * the hash-gated `kmeans_fit` query), per the round-5 verdict: fit's
    * trajectory is anchored by construction, not by a parallel
    * reimplementation. */
  def fit(points: DataFrame, k: Int, maxIter: Int = 50,
      atol: Double = DefaultAtol, rtol: Double = DefaultRtol,
      initFn: (DataFrame, Int) => Seq[Centroid] = init): KMeansModel =
    fitLoop(points, k, maxIter, initFn, identity, converged(_, _, atol, rtol))

  /** numpy-allclose on the ROUNDED chain in exact integer
    * ten-thousandths (|Δ10k|·10⁵ ≤ 10⁵ + |new10k| over BIGINTs — the
    * ×10⁹-scaled form of |Δ| ≤ atol + rtol·|new| with atol=1e-4,
    * rtol=1e-5), so the stopping decision is bit-deterministic on both
    * engines. The DuckDB mirror is [[KMeansOracle.fitTraceSql]]'s
    * `close` predicate. */
  def allclose10k(old: Seq[Centroid], next: Seq[Centroid]): Boolean = {
    def close(a: Double, b: Double): Boolean = {
      val (a10k, b10k) = (math.round(a * 10000), math.round(b * 10000))
      math.abs(a10k - b10k) * 100000L <= 100000L + math.abs(b10k)
    }
    old.zip(next).forall { case (a, b) => close(a.x, b.x) && close(a.y, b.y) }
  }

  /** THE Lloyd driver loop — raw ([[fit]]) and contract-chain
    * ([[KMeansQueries.fitTrace]]) runs are this one definition with
    * different hooks: `postStep` maps each iteration's centroids before
    * they enter the convergence test and the next assignment (identity
    * for the raw chain; 4-decimal rounding for the oracle-checkable
    * contract chain), `convergedFn` compares the previous post-stepped
    * centroids against the new ones.
    *
    * The loop's per-iteration engine is a `treeAggregate` over the
    * plane PACKED ONCE into per-partition primitive double arrays —
    * MLlib's own training-loop design, and (with `Dedup.labelsOf`) the
    * repo's second deliberate RDD use: a 70-iteration fit is pure
    * sequential-job latency, and a DataFrame [[step]] pays plan
    * analysis + codegen lookup + a two-stage shuffle job per
    * iteration (~120 ms × 70 ≈ 8.5 s at sf0.1) where the packed
    * aggregate pays one single-stage job (~40 ms): same argmin
    * (strict `<`, first-wins — mapper.py:58-66), same
    * sum/count-per-cluster math, identical to [[step]] modulo
    * float-summation order, which the contract chain's 4-decimal
    * boundary rounding absorbs by design (KMeansSpec pins
    * loop ≡ step-chain on the contract chain; the hash gates pin it
    * against DuckDB). A round-7 experiment went the OTHER direction —
    * fusing iterations into one DataFrame plan — and measured 6.4×
    * slower (stacked broadcast exchanges, array-column argmin): the
    * fix for a latency-bound loop is cheaper jobs, not bigger plans.
    *
    * Scale shape at 100 TB: the packed plane is 16 bytes/point
    * cached once (MEMORY_AND_DISK — spills gracefully), each
    * iteration moves K×partitions partial sums through a depth-2
    * tree aggregation and K rows to the driver. */
  def fitLoop(points: DataFrame, k: Int, maxIter: Int,
      initFn: (DataFrame, Int) => Seq[Centroid],
      postStep: Seq[Centroid] => Seq[Centroid],
      convergedFn: (Seq[Centroid], Seq[Centroid]) => Boolean): KMeansModel = {
    val plane = points.select("pid", "x", "y")
    val packed = plane.select("x", "y").rdd.mapPartitions { rows =>
      val xs = Array.newBuilder[Double]
      val ys = Array.newBuilder[Double]
      rows.foreach { r => xs += r.getDouble(0); ys += r.getDouble(1) }
      Iterator.single((xs.result(), ys.result()))
    }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // init is NOT post-stepped: the oracle chain's c0 is the raw
      // init (centroidChain rounds only at step boundaries), so the
      // first assignment must run against unrounded init on both sides
      var cs = initFn(plane, k)
      val history = Seq.newBuilder[Seq[Centroid]]
      history += cs
      var sizes = Map.empty[Int, Long]
      var iter = 0
      var done = false
      while (iter < maxIter && !done) {
        val (stepped, ns) = stepPacked(packed, cs)
        val next = postStep(stepped)
        iter += 1
        done = convergedFn(cs, next)
        cs = next
        sizes = ns
        history += cs
      }
      KMeansModel(cs, sizes, iter, done, history.result())
    } finally packed.unpersist(blocking = false)
  }

  /** One Lloyd cycle over the packed plane — [[step]]'s math on the
    * [[fitLoop]] substrate: per partition, a tight primitive loop
    * (argmin with the reference's strict-< first-wins tie-break)
    * accumulating K sums/counts; partials merge through
    * `treeAggregate`. Empty cluster keeps the old centroid, exactly
    * like [[step]]. */
  private def stepPacked(
      packed: org.apache.spark.rdd.RDD[(Array[Double], Array[Double])],
      cs: Seq[Centroid]): (Seq[Centroid], Map[Int, Long]) = {
    val sorted = cs.sortBy(_.id)
    val k = sorted.size
    val cx = sorted.map(_.x).toArray
    val cy = sorted.map(_.y).toArray
    val (sx, sy, n) = packed.treeAggregate(
      (new Array[Double](k), new Array[Double](k), new Array[Long](k)))(
      seqOp = { case (acc, (xs, ys)) =>
        val (ax, ay, an) = acc
        var i = 0
        while (i < xs.length) {
          val px = xs(i); val py = ys(i)
          var best = 0
          var bestD = Double.PositiveInfinity
          var j = 0
          while (j < k) {
            val dx = px - cx(j); val dy = py - cy(j)
            val d = dx * dx + dy * dy
            if (d < bestD) { bestD = d; best = j }
            j += 1
          }
          ax(best) += px; ay(best) += py; an(best) += 1L
          i += 1
        }
        acc
      },
      combOp = { case ((ax, ay, an), (bx, by, bn)) =>
        var j = 0
        while (j < k) { ax(j) += bx(j); ay(j) += by(j); an(j) += bn(j); j += 1 }
        (ax, ay, an)
      })
    val next = sorted.zipWithIndex.map { case (c, j) =>
      if (n(j) > 0L) Centroid(c.id, sx(j) / n(j), sy(j) / n(j)) else c
    }
    (next, sorted.zipWithIndex.map { case (c, j) => c.id -> n(j) }.toMap)
  }

  /** Mean squared distance to the assigned centroid (WSSSE/n). */
  def cost(points: DataFrame, cs: Seq[Centroid]): DataFrame = {
    val cxArr = array(cs.sortBy(_.id).map(c => lit(c.x)): _*)
    val cyArr = array(cs.sortBy(_.id).map(c => lit(c.y)): _*)
    assign(points, cs)
      .withColumn("dx", col("x") - element_at(cxArr, col("cid")))
      .withColumn("dy", col("y") - element_at(cyArr, col("cid")))
      .agg(
        round(avg(col("dx") * col("dx") + col("dy") * col("dy")), 4).as("mean_sq_dist"),
        count(lit(1)).as("n_points"))
  }
}

/** Point-plane extraction from the columnar testdata — the engine's
  * equivalent of the reference's `np.loadtxt` CSV plane (master.py:36-41).
  * `pid` is a unique point id used only for deterministic init. */
object Points {
  def lineitem(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem").select(
      (col("l_orderkey") * 10 + col("l_linenumber")).cast("long").as("pid"),
      (col("l_extendedprice") / 1000.0).as("x"),
      col("l_quantity").as("y"))

  val lineitemSql: String =
    "SELECT l_orderkey*10+l_linenumber AS pid, l_extendedprice/1000.0 AS x, l_quantity AS y FROM lineitem"

  /** Second plane for the multi-source scenario (master.py scenario 2). */
  def orders(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders").select(
      (-col("o_orderkey")).cast("long").as("pid"),
      (col("o_totalprice") / 1000.0).as("x"),
      (col("o_orderkey") % 50).cast("double").as("y"))

  val ordersSql: String =
    "SELECT CAST(-o_orderkey AS BIGINT) AS pid, o_totalprice/1000.0 AS x, CAST(o_orderkey % 50 AS DOUBLE) AS y FROM orders"

  /** Event-stream plane — the substrate of the streaming K-Means path
    * ([[graft.streaming.StreamOps]]); its batch twin is oracle-checked. */
  def events(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events").select(
      col("event_id").as("pid"),
      col("value").as("x"),
      (col("user_id") % 100).cast("double").as("y"))

  val eventsSql: String =
    "SELECT event_id AS pid, value AS x, CAST(user_id % 100 AS DOUBLE) AS y FROM events"
}
