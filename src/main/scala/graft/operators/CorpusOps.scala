package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{PolyHash, WordNgramHashes}

/** Corpus-management operators a training-data pipeline runs besides
  * dedup/quality (SURVEY.md §2.C/E companions):
  *
  *   - `decontaminate` — benchmark decontamination: flag corpus
  *     documents sharing any word-n-gram with a held-out evaluation set
  *     (the standard train/test-overlap check run before every LLM
  *     training job). The eval set is inherently tiny next to the
  *     corpus, so its distinct gram-hash set is BROADCAST — the corpus
  *     never shuffles; the whole check is one broadcast semi-join over
  *     a single corpus scan. That asymmetry (broadcast the benchmark,
  *     stream the corpus) is the only shape that works at 100 TB.
  *   - `sample_split` — deterministic stratified train/val/test
  *     assignment by a portable polynomial hash of the document id:
  *     reproducible across engines and runs, no RNG state, no shuffle
  *     beyond the final small per-(source, split) aggregation.
  *
  * Both use the same portable hash machinery as the dedup suite
  * ([[PolyHash]] / [[WordNgramHashes]]), so both are fully
  * DuckDB-oracle-checkable.
  */
object CorpusOps {

  /** Decontamination shingle width: 5-grams — short enough to catch
    * paraphrase-free overlap on small documents, long enough that
    * natural-language coincidence is rare. (Production corpora with
    * long documents typically use 8-13.) */
  val DecontamN = 5

  /** The held-out "benchmark" slice of the testdata: one source plays
    * the eval set, the rest are the training corpus. */
  val BenchmarkSource = "src0"

  /** Per-source contamination report: documents of each non-benchmark
    * source that share at least one [[DecontamN]]-gram with the
    * benchmark source. */
  def decontaminate(s: SparkSession, dir: String): DataFrame =
    decontaminateOn(Tables(s, dir, "documents"))

  /** Operator core over any (doc_id, source, text) frame — the entry
    * specs inject corpora through (CorpusOpsSpec plants a verbatim
    * benchmark copy and asserts it is flagged). */
  def decontaminateOn(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val hashed = docs
      .withColumn("hs", WordNgramHashes($"text", DecontamN))
      .select($"doc_id", $"source", explode($"hs").as("gh"))
    val bench = hashed.filter($"source" === BenchmarkSource)
      .select($"gh").distinct()
    val contaminated = hashed.filter($"source" =!= BenchmarkSource)
      .join(broadcast(bench), Seq("gh"), "left_semi")
      .select($"doc_id", $"source").distinct()
    val perSource = docs.filter($"source" =!= BenchmarkSource)
      .groupBy($"source").agg(count(lit(1)).as("n_docs"))
    val contPerSource = contaminated
      .groupBy($"source").agg(count(lit(1)).as("n_contaminated"))
    perSource.join(contPerSource, Seq("source"), "left")
      .select($"source", $"n_docs",
        coalesce($"n_contaminated", lit(0L)).as("n_contaminated"),
        round(coalesce($"n_contaminated", lit(0L)) / $"n_docs", 4)
          .as("contamination_rate"))
      .orderBy($"source")
  }

  val decontaminateSql: String = {
    val toks = graft.functions.TextFeatures.duckToks
    val ngrams = graft.functions.TextFeatures.duckNgrams(toks, DecontamN)
    s"""WITH grams AS (
       |  SELECT doc_id, source, unnest(list_distinct($ngrams)) AS gram
       |  FROM documents),
       |gh AS (
       |  SELECT DISTINCT doc_id, source,
       |    ${WordNgramHashes.duckSql("gram")} AS gh
       |  FROM grams),
       |bench AS (
       |  SELECT DISTINCT gh FROM gh WHERE source = '$BenchmarkSource'),
       |cont AS (
       |  SELECT DISTINCT g.doc_id, g.source
       |  FROM gh g JOIN bench USING (gh)
       |  WHERE g.source != '$BenchmarkSource'),
       |per_src AS (
       |  SELECT source, count(*) AS n_docs FROM documents
       |  WHERE source != '$BenchmarkSource' GROUP BY source),
       |cont_src AS (
       |  SELECT source, count(*) AS n_contaminated FROM cont GROUP BY source)
       |SELECT p.source, p.n_docs,
       |  CAST(coalesce(c.n_contaminated, 0) AS BIGINT) AS n_contaminated,
       |  round(coalesce(c.n_contaminated, 0) * 1.0 / p.n_docs, 4)
       |    AS contamination_rate
       |FROM per_src p LEFT JOIN cont_src c USING (source)
       |ORDER BY source""".stripMargin
  }

  /** Train/val/test split fractions in percent (train < 90 ≤ val < 95 ≤
    * test) over a 100-bucket hash ring. */
  val TrainPct = 90
  val ValPct = 95

  /** Deterministic stratified split summary: every document lands in a
    * split purely by `poly_hash(doc_id) mod 100` — stable across runs,
    * partitionings, and engines (no RNG, no sampling variance), which is
    * what makes a 100-TB train/val/test split reproducible and
    * incrementally extensible (new documents don't reshuffle old
    * assignments). */
  def sampleSplit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .withColumn("h", PolyHash($"doc_id".cast("string")) % 100)
      .withColumn("split",
        when($"h" < TrainPct, "train")
          .when($"h" < ValPct, "val")
          .otherwise("test"))
      .groupBy($"source", $"split")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("sum_chars"))
      .orderBy($"source", $"split")
  }

  val sampleSplitSql: String =
    s"""SELECT source, split, count(*) AS n_docs,
       |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
       |FROM (
       |  SELECT source, n_chars,
       |    CASE WHEN h < $TrainPct THEN 'train'
       |         WHEN h < $ValPct THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM (
       |    SELECT source, n_chars,
       |      ${PolyHash.duckSql("CAST(doc_id AS VARCHAR)")} % 100 AS h
       |    FROM documents))
       |GROUP BY source, split
       |ORDER BY source, split""".stripMargin

  /** Documents sampled per source by [[groupSample]]. */
  val SampleK = 5

  /** Deterministic per-group k-sample: for each source, the [[SampleK]]
    * documents with the smallest `poly_hash(doc_id)` (doc_id
    * tie-break). Hash-rank sampling gives every document equal
    * selection odds (the hash is uniform over ids) while staying
    * reproducible across runs, engines, and partitionings — the
    * "inspect 5 random docs per shard" debugging loop a corpus pipeline
    * runs constantly, made stable enough to diff between pipeline
    * versions.
    *
    * Scale shape: `row_number ≤ k` over a window is NOT a full
    * per-group sort at execution time — Spark inserts a
    * WindowGroupLimit (per-partition top-k heap BEFORE the exchange,
    * asserted in CorpusOpsSpec), so the shuffle carries ≤ k rows per
    * source per input partition. Same pattern as the reference loader's
    * seeded `random.sample` init (master.py:27-34) made
    * partition-independent — [[graft.kmeans.KMeans.initSample]] uses
    * the identical hash-rank trick. */
  def groupSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source")
      .orderBy($"h", $"doc_id")
    Tables(s, dir, "documents")
      .withColumn("h", PolyHash($"doc_id".cast("string")))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= SampleK)
      .select($"source", $"rk", $"doc_id", $"lang", $"n_chars")
      .orderBy($"source", $"rk")
  }

  val groupSampleSql: String =
    s"""SELECT source, rk, doc_id, lang, n_chars FROM (
       |  SELECT source, doc_id, lang, n_chars,
       |    row_number() OVER (PARTITION BY source
       |      ORDER BY ${PolyHash.duckSql("CAST(doc_id AS VARCHAR)")}, doc_id)
       |      AS rk
       |  FROM documents)
       |WHERE rk <= $SampleK
       |ORDER BY source, rk""".stripMargin

  /** Token budget per packed training sequence. */
  val PackBudget = 512

  /** Deterministic sequence packing summary: documents fill fixed-
    * [[PackBudget]]-token training sequences per source in doc_id order
    * with CONTIGUOUS fill — a document starts in the sequence holding
    * its first token and long documents spill into the following
    * sequences (the order-preserving dense packing a pretraining shard
    * build uses; no padding). Per-source output: docs, sequences
    * actually consumed (`⌈total/budget⌉` — counting only sequences
    * where a doc STARTS would under-count and report fill > 1 whenever
    * a doc exceeds the budget), total tokens, the densest sequence by
    * doc starts, and the fill ratio of the used sequences.
    *
    * Shape: one narrow scan computing token counts, one hash exchange
    * on source, per-source sort by doc_id feeding a running-sum window
    * — the sort IS the operator (packing is defined by an order). At
    * extreme per-source volume the same semantics run over bucketed
    * (source, doc_id)-sorted tables with zero extra shuffle
    * (BucketingSpec shows the write path). */
  def packSequences(s: SparkSession, dir: String): DataFrame =
    packSequencesWith(s, dir,
      size(graft.functions.TextFeatures.toks(lower(col("text")))))

  /** [[packSequences]] budgeting in SUBWORD (BPE-style) tokens instead
    * of whitespace words (round-5 verdict item 3): training-sequence
    * budgets are tokenizer budgets, and whitespace counts mis-size
    * packing by 20-40% on real text. Same packing semantics, same plan
    * shape — only the per-document token measure changes
    * ([[graft.functions.Subword]], whose greedy fold the oracle
    * mirrors as a DuckDB character fold). */
  def packSequencesBpe(s: SparkSession, dir: String): DataFrame =
    packSequencesWith(s, dir, graft.functions.Subword(lower(col("text"))))

  private def packSequencesWith(s: SparkSession, dir: String,
      tokensCol: org.apache.spark.sql.Column): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy($"doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val placed = Tables(s, dir, "documents")
      .withColumn("tokens", tokensCol)
      .withColumn("start", coalesce(sum($"tokens").over(w), lit(0L)))
      .withColumn("seq_id", ($"start" / PackBudget).cast("long"))
    val perSeq = placed.groupBy($"source", $"seq_id")
      .agg(count(lit(1)).as("docs_in_seq"))
      .groupBy($"source")
      .agg(max($"docs_in_seq").as("max_docs_per_seq"))
    placed.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"tokens").as("total_tokens"))
      .join(perSeq, "source")
      .withColumn("n_seqs", greatest(
        expr(s"(total_tokens + ${PackBudget - 1}) DIV $PackBudget"), lit(1L)))
      .select($"source", $"n_docs", $"n_seqs", $"total_tokens",
        $"max_docs_per_seq",
        round($"total_tokens" / ($"n_seqs" * lit(PackBudget.toDouble)), 4)
          .as("avg_fill"))
      .orderBy($"source")
  }

  val packSequencesSql: String =
    packSequencesSqlWith(s"len(${graft.functions.TextFeatures.duckToks})")

  // the _bpe twin reads the distinct-word-materialized subword totals
  // (Subword.duckDocCte — the round-12-verdict #6 sf10 timeout fix)
  // instead of folding per occurrence inline
  val packSequencesBpeSql: String =
    packSequencesSqlWith("coalesce(sd.subw, 0)",
      graft.functions.Subword.duckDocCte(
        graft.functions.TextFeatures.duckToks) + ",\n",
      "documents LEFT JOIN sdoc sd USING (doc_id)")

  private def packSequencesSqlWith(tokensExpr: String,
      pre: String = "", from: String = "documents"): String = {
    s"""WITH ${pre}t AS (
       |  SELECT source, doc_id, $tokensExpr AS tokens FROM $from),
       |placed AS (
       |  SELECT source, tokens,
       |    coalesce(sum(tokens) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      // $PackBudget AS seq_id
       |  FROM t),
       |per_seq AS (
       |  SELECT source, max(docs_in_seq) AS max_docs_per_seq FROM (
       |    SELECT source, seq_id, count(*) AS docs_in_seq
       |    FROM placed GROUP BY source, seq_id)
       |  GROUP BY source),
       |per_src AS (
       |  SELECT source, count(*) AS n_docs,
       |    CAST(sum(tokens) AS BIGINT) AS total_tokens
       |  FROM placed GROUP BY source)
       |SELECT p.source, p.n_docs,
       |  greatest((p.total_tokens + ${PackBudget - 1}) // $PackBudget, 1) AS n_seqs,
       |  p.total_tokens, q.max_docs_per_seq,
       |  round(p.total_tokens / (greatest((p.total_tokens + ${PackBudget - 1})
       |    // $PackBudget, 1) * ${PackBudget}.0), 4) AS avg_fill
       |FROM per_src p JOIN per_seq q USING (source)
       |ORDER BY source""".stripMargin
  }

  /** Resolution of the [[sourceMix]] sampling rates: rates are integer
    * ten-thousandths, so the keep decision is pure integer arithmetic
    * on both engines (the floating-ceil lesson from the containment
    * prefix bound, applied to sampling). */
  val MixScale = 10000L

  /** Domain-mix resampling — the mixing step of a pretraining data
    * build: down-sample every source to the TOKEN budget of the
    * smallest source (the "uniform over domains" mix), with a
    * deterministic per-document keep decision. For each source s with
    * token total T_s, the keep rate is r_s = ⌊min_T · [[MixScale]] /
    * T_s⌋ ten-thousandths, and a document is kept iff
    * `poly_hash(doc_id ∥ "#mix") mod MixScale < r_s` — reproducible
    * across runs, engines, and partitionings, independent of the
    * [[sampleSplit]] ring (different hash salt), and incrementally
    * stable (new documents never flip old decisions; only the rates
    * move as totals drift).
    *
    * Scale shape: the rate table is one row per SOURCE — a broadcast
    * by construction — and the corpus is scanned with per-row hashing
    * plus a map-side-combined per-source aggregation; no corpus-volume
    * shuffle anywhere. The stats pass reads only (source, text), and
    * at 100 TB would read a pre-aggregated token-count table instead —
    * the operator's join shape doesn't change. Output per source:
    * docs/tokens in, docs/tokens kept, the integer target rate, the
    * achieved doc-level rate. */
  def sourceMix(s: SparkSession, dir: String): DataFrame =
    sourceMixOn(Tables(s, dir, "documents"))

  /** [[sourceMix]] with SUBWORD (BPE-style) token budgets — the measure
    * a real mix actually balances (round-5 verdict item 3). Rates move
    * (token totals differ per source) but the keep-decision hash, join
    * shape, and output schema are unchanged. */
  def sourceMixBpe(s: SparkSession, dir: String): DataFrame =
    sourceMixOn(Tables(s, dir, "documents"),
      graft.functions.Subword(lower(col("text"))))

  /** Operator core over any (doc_id, source, text) frame — the spec
    * drives corpora with hand-computed rates through it. */
  def sourceMixOn(docsIn: DataFrame,
      tokensCol: org.apache.spark.sql.Column =
        size(graft.functions.TextFeatures.toks(lower(col("text")))).cast("long"))
      : DataFrame =
    mixCore(docsIn, tokensCol, "#mix", s"(min_tok * $MixScale) DIV toks_src")

  /** TEMPERATURE-scaled mix (α = 1/2): per-source keep rate
    * `√(min_tok / toks_src)` in exact ten-thousandths — the gentler
    * rebalance multilingual/multi-domain trainers actually use (target
    * share ∝ share^α, Conneau & Lample 2019; UniMax's cap is the α→0
    * end): the biggest source is down-sampled by the square root of
    * its excess instead of flattened to the smallest source's budget,
    * preserving more head-domain mass at the same determinism. The
    * rate is a fixed IEEE expression (BIGINT ratio → double divide →
    * exactly-rounded sqrt → ×10⁴ → floor) written identically on both
    * engines, so the cut is bit-deterministic; the keep rule is the
    * same salted PolyHash mod 10⁴, independent of `source_mix`'s via
    * the '#temp' salt. */
  def sourceMixTemp(s: SparkSession, dir: String): DataFrame =
    sourceMixTempOn(Tables(s, dir, "documents"))

  /** [[sourceMixTemp]] over an explicit documents frame (spec hook). */
  private[graft] def sourceMixTempOn(docsIn: DataFrame): DataFrame =
    mixCore(docsIn,
      size(graft.functions.TextFeatures.toks(lower(col("text")))).cast("long"),
      "#temp",
      s"CAST(FLOOR($MixScale * SQRT(CAST(min_tok AS DOUBLE) / " +
        "CAST(toks_src AS DOUBLE))) AS BIGINT)")

  /** The shared mix plan: one token census, a |sources|-row rate table
    * broadcast back, keep = salted-hash comparison in the scan — the
    * corpus never shuffles rows; variants differ only in the rate
    * FORMULA (integer ten-thousandths) and the hash salt. */
  private def mixCore(docsIn: DataFrame,
      tokensCol: org.apache.spark.sql.Column, salt: String,
      rateSql: String): DataFrame = {
    import docsIn.sparkSession.implicits._
    val docs = docsIn
      .withColumn("words", tokensCol.cast("long"))
    val perSrc = docs.groupBy($"source")
      .agg(sum($"words").as("toks_src"))
    val minTok = perSrc.agg(min($"toks_src").as("min_tok"))
    val rates = perSrc.crossJoin(broadcast(minTok))
      .withColumn("rate", expr(rateSql))
      .select($"source", $"rate")
    docs.join(broadcast(rates), "source")
      .withColumn("keep",
        PolyHash(concat($"doc_id".cast("string"), lit(salt))) % MixScale < $"rate")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"keep", 1L).otherwise(0L)).as("n_kept"),
        sum($"words").as("tokens_in"),
        sum(when($"keep", $"words").otherwise(0L)).as("tokens_kept"),
        max($"rate").as("target_rate"),
        round(sum(when($"keep", 1L).otherwise(0L)) / count(lit(1)).cast("double"), 4)
          .as("achieved_rate"))
      .orderBy($"source")
  }

  val sourceMixSql: String =
    sourceMixSqlWith(s"len(${graft.functions.TextFeatures.duckToks})")

  // distinct-word-materialized subword totals — see packSequencesBpeSql
  val sourceMixBpeSql: String =
    sourceMixSqlWith("coalesce(sd.subw, 0)",
      pre = graft.functions.Subword.duckDocCte(
        graft.functions.TextFeatures.duckToks) + ",\n",
      from = "documents LEFT JOIN sdoc sd USING (doc_id)")

  val sourceMixTempSql: String =
    sourceMixSqlWith(s"len(${graft.functions.TextFeatures.duckToks})",
      s"CAST(floor($MixScale * sqrt(CAST(min_tok AS DOUBLE) / " +
        "CAST(toks_src AS DOUBLE))) AS BIGINT)",
      "#temp")

  private def sourceMixSqlWith(tokensExpr: String,
      rateSql: String = s"(min_tok * $MixScale) // toks_src",
      salt: String = "#mix",
      pre: String = "", from: String = "documents"): String = {
    // d is MATERIALIZED (round-12 sf1 oracle-timeout fix): DuckDB 1.0
    // inlines plain CTEs per reference, and d is read twice (per_src,
    // keyed) — for source_mix_bpe its tokens expression is the
    // per-character subword fold, so the inline re-ran the most
    // expensive scalar pipeline in the suite twice. Oracle-side only.
    s"""WITH ${pre}d AS MATERIALIZED (
       |  SELECT source, doc_id, CAST($tokensExpr AS BIGINT) AS words
       |  FROM $from),
       |per_src AS (
       |  SELECT source, CAST(sum(words) AS BIGINT) AS toks_src
       |  FROM d GROUP BY source),
       |mn AS (SELECT min(toks_src) AS min_tok FROM per_src),
       |rates AS (
       |  SELECT source, $rateSql AS rate
       |  FROM per_src CROSS JOIN mn),
       |keyed AS (
       |  SELECT d.source, d.words, r.rate,
       |    CASE WHEN ${PolyHash.duckSql(s"CAST(doc_id AS VARCHAR) || '$salt'")}
       |      % $MixScale < r.rate THEN 1 ELSE 0 END AS keep
       |  FROM d JOIN rates r USING (source))
       |SELECT source, count(*) AS n_docs,
       |  CAST(sum(keep) AS BIGINT) AS n_kept,
       |  CAST(sum(words) AS BIGINT) AS tokens_in,
       |  CAST(sum(CASE WHEN keep = 1 THEN words ELSE 0 END) AS BIGINT)
       |    AS tokens_kept,
       |  CAST(max(rate) AS BIGINT) AS target_rate,
       |  round(sum(keep) * 1.0 / count(*), 4) AS achieved_rate
       |FROM keyed GROUP BY source ORDER BY source""".stripMargin
  }

  /** The corpus data card — the (lang × source) ROLLUP summary a
    * pipeline publishes beside a released dataset (per-cell and
    * marginal grains in ONE pass; Spark computes all three grains
    * map-side, the partial-agg discipline of `rollup_agg`): document
    * and token volume, character volume, and the model-filter outcome
    * (keep count under [[LangModel.marginOf]]'s integer margin, mean
    * margin). Every cell is integers + one final division, so the
    * whole card sits under the hash gate. The margin column stays on
    * the FIXED Weyl reference weights deliberately: a data card is an
    * audit artifact, and a constant scorer is recomputable by any
    * third party with no training state; the shipped keep/drop filter
    * (`quality_classifier`, the streaming gate) scores the LEARNED
    * [[LangModel.clfTrain]] weights. */
  def corpusCard(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.{TextFeatures => TFF}
    val d = Tables(s, dir, "documents").select(
      $"lang", $"source", $"n_chars",
      size(TFF.toks(lower($"text"))).cast("long").as("nt"),
      LangModel.marginOf($"text").as("margin"))
    d.rollup($"lang", $"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"nt").as("n_tokens"),
        sum($"n_chars").as("sum_chars"),
        sum(when($"margin" > 0, 1L).otherwise(0L)).as("n_keep"),
        round(sum($"margin").cast("double") /
          count(lit(1)).cast("double"), 4).as("avg_margin"))
      .select(coalesce($"lang", lit("ALL")).as("lang"),
        coalesce($"source", lit("ALL")).as("source"),
        $"n_docs", $"n_tokens", $"sum_chars", $"n_keep", $"avg_margin")
      .orderBy($"lang", $"source")
  }

  val corpusCardSql: String =
    s"""WITH d AS (
       |  SELECT lang, source, n_chars,
       |    len(${graft.functions.TextFeatures.duckToks}) AS nt,
       |    ${LangModel.duckMargin} AS margin
       |  FROM documents)
       |SELECT coalesce(lang, 'ALL') AS lang,
       |  coalesce(source, 'ALL') AS source,
       |  count(*) AS n_docs,
       |  CAST(sum(nt) AS BIGINT) AS n_tokens,
       |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       |  CAST(sum(CASE WHEN margin > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_keep,
       |  round(CAST(sum(margin) AS DOUBLE) / CAST(count(*) AS DOUBLE), 4)
       |    AS avg_margin
       |FROM d
       |GROUP BY ROLLUP (lang, source)
       |ORDER BY lang, source""".stripMargin

  /** Fraction of each source kept by the per-source quality quota. */
  val SourceQuotaFrac = 0.6

  /** Per-source quality quota census (the RefinedWeb-style per-domain
    * cap, Penedo et al. 2023: bounding any one domain's share of the
    * corpus by keeping only its best documents): within each source,
    * keep the top [[SourceQuotaFrac]] of documents by composite quality
    * score ([[TextAnalysis.qualityDocScore]] — bit-identical doubles in
    * both engines, doc_id tie-break) and report per source the doc
    * count, kept count, keep rate, and the score cut (min kept score).
    *
    * This EXACT form ranks with `row_number` over a window partitioned
    * by source — correct and oracle-checkable, but a source is a
    * near-global partition at 100 TB (a handful of sources share the
    * whole corpus), so the shipped scale path is
    * [[sourceQuotaApprox]]: a grouped `approx_percentile` threshold,
    * window-free. Same exact-baseline-plus-approx-twin discipline as
    * `lm_buckets`/`dsir_sample` (CorpusOpsSpec bounds the drift). */
  def sourceQuota(s: SparkSession, dir: String): DataFrame =
    quotaCensusExact(TextAnalysis.trainQualityScores(s, dir))

  def sourceQuotaOn(docs: DataFrame): DataFrame =
    quotaCensusExact(TextAnalysis.qualityDocScore(docs))

  private def quotaCensusExact(scored: DataFrame): DataFrame = {
    import scored.sparkSession.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy($"score".desc, $"doc_id")
    val wc = org.apache.spark.sql.expressions.Window.partitionBy($"source")
    scored
      .withColumn("rk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wc))
      .withColumn("keep", ($"rk" <= ceil($"n" * SourceQuotaFrac)).cast("int"))
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"keep").as("n_kept"),
        round(avg($"keep".cast("double")), 4).as("keep_rate"),
        round(min(when($"keep" === 1, $"score")), 4).as("cut_score"))
      .orderBy($"source")
  }

  val sourceQuotaSql: String =
    s"""WITH scored AS (${TextAnalysis.qualityDocScoreSql}),
       |r AS (
       |  SELECT source, score,
       |    row_number() OVER (PARTITION BY source ORDER BY score DESC, doc_id) AS rk,
       |    count(*) OVER (PARTITION BY source) AS n
       |  FROM scored),
       |k AS (
       |  SELECT source, score,
       |    CASE WHEN rk <= ceil(n * $SourceQuotaFrac) THEN 1 ELSE 0 END AS keep
       |  FROM r)
       |SELECT source, count(*) AS n_docs,
       |  CAST(sum(keep) AS BIGINT) AS n_kept,
       |  round(avg(keep * 1.0), 4) AS keep_rate,
       |  round(min(CASE WHEN keep = 1 THEN score END), 4) AS cut_score
       |FROM k GROUP BY source ORDER BY source""".stripMargin

  /** Window-free twin of [[sourceQuota]] — the shipped 100-TB cut: a
    * grouped `approx_percentile` computes each source's score threshold
    * (one tiny |sources|-row table, broadcast back), and the quota
    * becomes a codegen'd per-row comparison — two narrow scans, no
    * per-source sort, no window anywhere in the plan (CorpusOpsSpec
    * asserts plan shape and bounds |approx − exact| keep drift). */
  def sourceQuotaApprox(s: SparkSession, dir: String): DataFrame =
    quotaCensusApprox(TextAnalysis.trainQualityScores(s, dir))

  def sourceQuotaApproxOn(docs: DataFrame): DataFrame =
    quotaCensusApprox(TextAnalysis.qualityDocScore(docs))

  private def quotaCensusApprox(scored: DataFrame): DataFrame = {
    import scored.sparkSession.implicits._
    val thr = scored.groupBy($"source")
      .agg(percentile_approx($"score", lit(1.0 - SourceQuotaFrac), lit(10000))
        .as("thr"))
    scored.join(broadcast(thr), Seq("source"))
      .withColumn("keep", ($"score" >= $"thr").cast("int"))
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"keep").as("n_kept"),
        round(avg($"keep".cast("double")), 4).as("keep_rate"),
        round(min(when($"keep" === 1, $"score")), 4).as("cut_score"))
      .orderBy($"source")
  }

  /** Retrieval-chunking geometry: window and overlap in whitespace
    * tokens. [[ChunkSize]] is a POWER OF TWO on purpose: the last-chunk
    * fill ratio `last / ChunkSize` is then an exact binary fraction, its
    * per-source sum is order-independent, and the census hash-gates at
    * any scale (the same order-independence discipline as
    * [[TpchExtra.moneySum]], achieved with arithmetic instead of
    * DECIMAL). */
  val ChunkSize = 128
  val ChunkOverlap = 32

  /** RAG-style chunking census: every document splits into
    * [[ChunkSize]]-token windows advancing by `ChunkSize - ChunkOverlap`
    * (the retrieval-index twin of `pack_sequences` — chunks OVERLAP so
    * no answer span straddles a boundary unseen, where training shards
    * pack contiguously). The geometry per doc is closed-form integer
    * arithmetic over the token count — no explode, no per-chunk rows —
    * so the census is ONE narrow scan + the source rollup; per source:
    * docs, chunks, docs needing >1 chunk, mean chunks/doc, mean
    * last-chunk fill (the wasted-index-slot metric a chunking config is
    * tuned by). oracle. */
  def chunkDocs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val stride = ChunkSize - ChunkOverlap
    Tables(s, dir, "documents")
      .select($"source",
        size(graft.functions.TextFeatures.toks(lower($"text"))).cast("long").as("t"))
      .filter($"t" > 0)
      .withColumn("chunks",
        (lit(1L) + ceil(greatest($"t" - ChunkSize, lit(0L)) /
          lit(stride.toDouble))).cast("long"))
      .withColumn("last_fill",
        least(($"t" - ($"chunks" - 1L) * stride) / lit(ChunkSize.toDouble), lit(1.0)))
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"chunks").as("n_chunks"),
        sum(($"chunks" > 1L).cast("long")).as("n_multi_chunk"),
        round(avg($"chunks".cast("double")), 4).as("avg_chunks"),
        round(avg($"last_fill"), 4).as("avg_last_fill"))
      .orderBy($"source")
  }

  val chunkDocsSql: String = {
    val toks = graft.functions.TextFeatures.duckToks
    val stride = ChunkSize - ChunkOverlap
    s"""WITH t AS (
       |  SELECT source, len($toks) AS t FROM documents),
       |g AS (
       |  SELECT source, t,
       |    CAST(1 + ceil(greatest(t - $ChunkSize, 0) / $stride.0) AS BIGINT) AS chunks
       |  FROM t WHERE t > 0),
       |f AS (
       |  SELECT source, chunks,
       |    least((t - (chunks - 1) * $stride) / $ChunkSize.0, 1.0) AS last_fill
       |  FROM g)
       |SELECT source, count(*) AS n_docs,
       |  CAST(sum(chunks) AS BIGINT) AS n_chunks,
       |  CAST(sum(CASE WHEN chunks > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_multi_chunk,
       |  round(avg(chunks * 1.0), 4) AS avg_chunks,
       |  round(avg(last_fill), 4) AS avg_last_fill
       |FROM f GROUP BY source ORDER BY source""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "chunk_docs" -> (chunkDocs(_, _)),
    "source_quota" -> (sourceQuota(_, _)),
    "source_quota_approx" -> (sourceQuotaApprox(_, _)),
    "corpus_card" -> (corpusCard(_, _)),
    "source_mix" -> (sourceMix(_, _)),
    "source_mix_temp" -> (sourceMixTemp(_, _)),
    "source_mix_bpe" -> (sourceMixBpe(_, _)),
    "decontaminate" -> (decontaminate(_, _)),
    "sample_split" -> (sampleSplit(_, _)),
    "group_sample" -> (groupSample(_, _)),
    "pack_sequences" -> (packSequences(_, _)),
    "pack_sequences_bpe" -> (packSequencesBpe(_, _)))

  def oracles: Map[String, String] = Map(
    "chunk_docs" -> chunkDocsSql,
    "source_quota" -> sourceQuotaSql,
    "corpus_card" -> corpusCardSql,
    "source_mix" -> sourceMixSql,
    "source_mix_temp" -> sourceMixTempSql,
    "source_mix_bpe" -> sourceMixBpeSql,
    "decontaminate" -> decontaminateSql,
    "sample_split" -> sampleSplitSql,
    "group_sample" -> groupSampleSql,
    "pack_sequences" -> packSequencesSql,
    "pack_sequences_bpe" -> packSequencesBpeSql)
}
