package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.PolyHash

/** SURVEY.md §2.E — text analysis over the `documents` table: token
  * counting, language-ID heuristic, quality scoring, document
  * fingerprinting. These are the per-document map stages of a training-data
  * pipeline: every query is a single narrow scan + per-row codegen'd
  * expressions + one small aggregation — no join, at most one shuffle on a
  * low-cardinality key, so the shape survives 100 TB unchanged.
  *
  * Oracle parity: token = non-empty `\s+` split; char-class counts via
  * global regexp_replace (DuckDB needs the explicit 'g' flag); ratios are
  * computed identically per row in both engines before aggregation.
  */
object TextAnalysis {

  /** Non-empty whitespace tokens of (lowercased) text — see
    * [[graft.functions.TextFeatures]]. */
  private def toks(c: Column): Column = graft.functions.TextFeatures.toks(c)

  private val duckToks = graft.functions.TextFeatures.duckToks

  private def duckTokCount(words: Seq[String]): String =
    s"len(list_filter($duckToks, t -> ${words.map(w => s"t = '$w'").mkString(" OR ")}))"

  // ---------------------------------------------------------------- stats

  /** Per-source corpus stats: docs, whitespace words, regex (BPE-ish)
    * tokens, chars. */
  def textStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tokenRe = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
    Tables(s, dir, "documents")
      .withColumn("words", size(toks(lower($"text"))))
      .withColumn("tokens", regexp_count($"text", lit(tokenRe)))
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"words").as("sum_words"),
        round(avg($"words"), 4).as("avg_words"),
        sum($"tokens").as("sum_tokens"),
        sum(length($"text")).as("sum_chars"),
        round(avg(length($"text")), 4).as("avg_chars"))
      .orderBy($"source")
  }

  // CAST(sum(..) AS BIGINT): DuckDB sum(BIGINT) returns HUGEINT → float64
  // in the driver's pandas compare; the cast restores Spark's dtype.
  val textStatsSql: String =
    s"""SELECT source, count(*) AS n_docs,
       |  CAST(sum(words) AS BIGINT) AS sum_words, round(avg(words), 4) AS avg_words,
       |  CAST(sum(tokens) AS BIGINT) AS sum_tokens,
       |  CAST(sum(length(text)) AS BIGINT) AS sum_chars, round(avg(length(text)), 4) AS avg_chars
       |FROM (
       |  SELECT source, text, len($duckToks) AS words,
       |    len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS tokens
       |  FROM documents)
       |GROUP BY source ORDER BY source""".stripMargin

  // -------------------------------------------------------------- lang id

  /** Stopword-marker language heuristic. Marker hit-counts per language,
    * argmax with fixed priority tie-break, vs the labeled `lang` column →
    * confusion counts. (The synthetic corpus is English-vocabulary
    * regardless of label; the *computation* is what the oracle checks.) */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of"),
    "es" -> Seq("el", "la", "de"),
    "de" -> Seq("der", "die", "und"),
    "fr" -> Seq("le", "les", "et"),
    "zh" -> Seq("de", "shi", "zai"))

  def langId(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // ONE tokenization scores every language: marker_counts returns
    // [total, c_en, c_es, ...] in a single pass where the composed
    // per-language tokCount columns re-ran split 5× per row (measured
    // in the sf0.1 plan; see MarkerCounts scaladoc)
    val scored = langMarkers.zipWithIndex.foldLeft(
        Tables(s, dir, "documents").withColumn("mc",
          graft.functions.MarkerCounts($"text", langMarkers.map(_._2)))) {
      case (df, ((lang, _), i)) => df.withColumn(s"s_$lang", $"mc"(i + 1))
    }
    // argmax with declaration-order priority tie-break
    val pred = langMarkers.map(_._1).zipWithIndex.foldRight(lit("unk")) {
      case ((lang, _), els) =>
        val beats = langMarkers.map(_._1).filter(_ != lang)
          .map(o => col(s"s_$lang") >= col(s"s_$o")).reduce(_ && _)
        when(beats && col(s"s_$lang") > 0, lang).otherwise(els)
    }
    scored.withColumn("pred", pred)
      .groupBy($"lang", $"pred")
      .agg(count(lit(1)).as("n"))
      .orderBy($"lang", $"pred")
  }

  val langIdSql: String = {
    val scores = langMarkers
      .map { case (l, ws) => s"${duckTokCount(ws)} AS s_$l" }.mkString(",\n    ")
    val langs = langMarkers.map(_._1)
    val pred = langs.foldRight("'unk'") { (lang, els) =>
      val beats = langs.filter(_ != lang).map(o => s"s_$lang >= s_$o").mkString(" AND ")
      s"CASE WHEN $beats AND s_$lang > 0 THEN '$lang' ELSE $els END"
    }
    s"""SELECT lang, pred, count(*) AS n FROM (
       |  SELECT lang, $pred AS pred FROM (
       |    SELECT lang, text,
       |    $scores
       |    FROM documents))
       |GROUP BY lang, pred ORDER BY lang, pred""".stripMargin
  }

  // ------------------------------------------------------------- quality

  /** Composite quality score from length / punctuation / digit / stopword
    * ratios, bucketed to 0.1; per-bucket counts + mean components. */
  def qualityScore(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables(s, dir, "documents")
      // word total + stopword count from ONE tokenization pass
      .withColumn("mc", graft.functions.MarkerCounts($"text",
        Seq(Seq("the", "a", "of"))))
      .withColumn("chars", greatest(length($"text"), lit(1)))
      .withColumn("words", greatest($"mc"(0), lit(1L)))
      .withColumn("punct",
        length(regexp_replace($"text", "[A-Za-z0-9\\s]", "")) / $"chars")
      .withColumn("digit",
        length(regexp_replace($"text", "[^0-9]", "")) / $"chars")
      .withColumn("stop", $"mc"(1) / $"words")
      .withColumn("lenscore", least($"words" / lit(100.0), lit(1.0)))
      .withColumn("score",
        lit(0.25) * $"lenscore" + lit(0.25) * (lit(1.0) - $"punct") +
        lit(0.25) * (lit(1.0) - $"digit") + lit(0.25) * $"stop")
      .withColumn("bucket", floor($"score" * 10).cast("int"))
    docs.groupBy($"bucket")
      .agg(
        count(lit(1)).as("n_docs"),
        round(avg($"score"), 4).as("avg_score"),
        round(avg($"punct"), 4).as("avg_punct_ratio"),
        round(avg($"stop"), 4).as("avg_stop_ratio"))
      .orderBy($"bucket")
  }

  val qualityScoreSql: String =
    s"""SELECT bucket, count(*) AS n_docs,
       |  round(avg(score), 4) AS avg_score,
       |  round(avg(punct), 4) AS avg_punct_ratio,
       |  round(avg(stop), 4) AS avg_stop_ratio
       |FROM (
       |  SELECT CAST(floor(score * 10) AS INT) AS bucket, score, punct, stop FROM (
       |    SELECT
       |      0.25 * least(words / 100.0, 1.0) + 0.25 * (1.0 - punct)
       |        + 0.25 * (1.0 - digit) + 0.25 * stop AS score,
       |      punct, stop
       |    FROM (
       |      SELECT
       |        length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) * 1.0 / chars AS punct,
       |        length(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0 / chars AS digit,
       |        ${duckTokCount(Seq("the", "a", "of"))} * 1.0 / words AS stop,
       |        words
       |      FROM (
       |        SELECT text, greatest(length(text), 1) AS chars,
       |          greatest(len($duckToks), 1) AS words
       |        FROM documents))))
       |GROUP BY bucket ORDER BY bucket""".stripMargin

  // --------------------------------------------------------- fingerprint

  /** Rolling polynomial fingerprint per document ([[PolyHash]], codegen'd)
    * + per-fingerprint duplicate-group size. */
  def docFingerprint(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .select($"doc_id", PolyHash($"text").as("fp"))
      .withColumn("group_size",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy($"fp")))
      .orderBy($"doc_id")
  }

  val docFingerprintSql: String =
    s"""SELECT doc_id, fp, count(*) OVER (PARTITION BY fp) AS group_size
       |FROM (SELECT doc_id, ${PolyHash.duckSql("text")} AS fp FROM documents)
       |ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------- vocab

  /** Corpus vocabulary: top-50 words by total occurrences (word
    * tie-break), with document frequency. One explode + one word-keyed
    * aggregation; TakeOrdered ranks without a global sort — the plan a
    * 100-TB vocabulary build needs. */
  def vocabTopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .select($"doc_id", explode(toks(lower($"text"))).as("w"))
      .groupBy($"w")
      .agg(count(lit(1)).as("n"), count_distinct($"doc_id").as("doc_freq"))
      .orderBy($"n".desc, $"w")
      .limit(50)
  }

  val vocabTopKSql: String =
    s"""SELECT w, count(*) AS n, count(DISTINCT doc_id) AS doc_freq
       |FROM (SELECT doc_id, unnest($duckToks) AS w FROM documents)
       |GROUP BY w ORDER BY n DESC, w LIMIT 50""".stripMargin

  // ----------------------------------------------------- heavy hitters

  /** Heavy-hitter threshold denominator: report words with frequency
    * strictly above total/[[HhDenom]]. */
  val HhDenom = 200L

  /** Misra-Gries summary capacity. The MG guarantee retains every item
    * with frequency > N/(capacity+1); with capacity ≫ [[HhDenom]] the
    * candidate set provably contains every true heavy hitter, so the
    * exact re-count below returns the EXACT answer at any partitioning
    * — the sketch only bounds memory, never the result. */
  val HhCapacity = 1000

  /** Exact corpus heavy hitters with bounded memory — the sketch-then-
    * verify shape of the dedup suite applied to frequency counting:
    *
    *   1. candidate pass: one scan aggregated by the Misra-Gries
    *      [[graft.functions.FrequentWords]] summary (≤ [[HhCapacity]]
    *      counters per partition, merged on ONE reducer as
    *      capacity-bounded partials) — provably a superset of every
    *      word with frequency > N/[[HhDenom]];
    *   2. verify pass: exact counts of CANDIDATE words only, via a
    *      broadcast semi-join that filters the corpus map-side, so the
    *      word shuffle carries ≤ capacity distinct keys.
    *
    * Compare the naive exact plan ([[vocabTopK]]'s full word-keyed
    * shuffle): at 100 TB that exchange carries every word occurrence;
    * this one carries the total count (1 row) + candidate occurrences.
    * Output is deterministic and exact — hence oracle-checkable against
    * a plain GROUP BY / HAVING — because the threshold compare uses
    * exact integer arithmetic (cnt · denom > total). */
  def heavyHitters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val words = Tables(s, dir, "documents")
      .select(explode(toks(lower($"text"))).as("w"))
    val cands = words.agg(
      graft.functions.FrequentWords($"w", HhCapacity).as("cands"),
      count(lit(1)).as("total"))
    val candWords = cands.select(explode($"cands").as("w"), $"total")
    words.join(broadcast(candWords), "w")
      .groupBy($"w", $"total")
      .agg(count(lit(1)).as("cnt"))
      .filter($"cnt" * HhDenom > $"total")
      .select($"w", $"cnt",
        round($"cnt" / $"total".cast("double"), 4).as("share"))
      .orderBy($"w")
  }

  val heavyHittersSql: String =
    s"""WITH w AS (SELECT unnest($duckToks) AS w FROM documents),
       |t AS (SELECT count(*) AS total FROM w)
       |SELECT w, count(*) AS cnt,
       |  round(count(*) / CAST(total AS DOUBLE), 4) AS share
       |FROM w CROSS JOIN t
       |GROUP BY w, total
       |HAVING count(*) * $HhDenom > total
       |ORDER BY w""".stripMargin

  // --------------------------------------------------------- normalize

  /** Normalization map stage: lowercase, strip non-alphanumerics (keep
    * spaces), collapse whitespace runs, trim. Reports per-source
    * shrinkage — the cheap cleanup pass a corpus runs before
    * tokenization; pure per-row codegen'd string ops, no shuffle before
    * the final small aggregation. */
  def textNormalize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .withColumn("norm", trim(regexp_replace(
        regexp_replace(lower($"text"), "[^a-z0-9\\s]", " "), "\\s+", " ")))
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(length($"text")).as("raw_chars"),
        sum(length($"norm")).as("norm_chars"),
        round(avg(length($"norm") / greatest(length($"text"), lit(1))), 4)
          .as("avg_keep_ratio"))
      .orderBy($"source")
  }

  // sums CAST to BIGINT for dtype parity (see textStatsSql)
  val textNormalizeSql: String =
    """SELECT source, count(*) AS n_docs,
      |  CAST(sum(length(text)) AS BIGINT) AS raw_chars,
      |  CAST(sum(length(norm)) AS BIGINT) AS norm_chars,
      |  round(avg(length(norm) * 1.0 / greatest(length(text), 1)), 4)
      |    AS avg_keep_ratio
      |FROM (
      |  SELECT source, text,
      |    trim(regexp_replace(regexp_replace(lower(text),
      |      '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')) AS norm
      |  FROM documents)
      |GROUP BY source ORDER BY source""".stripMargin

  // --------------------------------------------------------------- tfidf

  val TfidfTopK = 10

  /** Per-source top-[[TfidfTopK]] terms by summed TF-IDF (smoothed idf
    * = ln((N+1)/(df+1)), corpus-wide df). Plan: one explode scan → tf
    * per (source, doc, word) with map-side partial agg → corpus df per
    * word → score agg per (source, word) → per-source window top-k.
    * Every shuffle is keyed by words (high cardinality, skew-free);
    * ranking uses the ROUNDED score (word tie-break) so cross-engine
    * float noise below the 4-decimal contract cannot reorder the
    * result. */
  def tfidfTopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables(s, dir, "documents")
    val n = docs.count() // one scalar; the reference pattern for corpus constants
    val tf = docs.select($"source", $"doc_id", explode(toks(lower($"text"))).as("w"))
      .groupBy($"source", $"doc_id", $"w")
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy($"w").agg(count(lit(1)).as("df"))
    val scored = tf.join(df, "w")
      .withColumn("idf", log((lit(n) + 1.0) / ($"df" + lit(1.0))))
      .groupBy($"source", $"w")
      .agg(round(sum($"tf" * $"idf"), 4).as("score"))
    val byScore = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy($"score".desc, $"w")
    scored.withColumn("rk", row_number().over(byScore))
      .filter($"rk" <= TfidfTopK)
      .select($"source", $"w", $"score", $"rk")
      .orderBy($"source", $"rk")
  }

  val tfidfTopKSql: String =
    s"""WITH tf AS (
       |  SELECT source, doc_id, w, count(*) AS tf FROM (
       |    SELECT source, doc_id, unnest($duckToks) AS w FROM documents)
       |  GROUP BY source, doc_id, w),
       |n AS (SELECT count(*) AS n FROM documents),
       |df AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
       |scored AS (
       |  SELECT source, w, round(sum(tf * ln((n.n + 1.0) / (df.df + 1.0))), 4) AS score
       |  FROM tf JOIN df USING (w) CROSS JOIN n
       |  GROUP BY source, w),
       |ranked AS (
       |  SELECT source, w, score,
       |    CAST(row_number() OVER (PARTITION BY source
       |      ORDER BY score DESC, w) AS INT) AS rk
       |  FROM scored)
       |SELECT source, w, score, rk FROM ranked
       |WHERE rk <= $TfidfTopK
       |ORDER BY source, rk""".stripMargin

  // ---------------------------------------------------------- cardinality

  val KmvK = 64
  private val KmvNum = (KmvK - 1).toLong * PolyHash.Mod // (k-1)·p
  // Scatter step: raw PolyHash of short words is biased toward small
  // values (few base-31 wraps), which breaks the KMV uniformity
  // assumption; a multiplicative affine map mod p spreads them across
  // [0, p) and stays portable (h < 2^31, A < 2^31 ⇒ product < 2^62).
  val KmvA = 1103515245L
  val KmvB = 12345L

  /** Per-source distinct-word cardinality, exact AND via the bounded-
    * memory [[graft.functions.KMinValues]] KMV sketch (k smallest
    * distinct PolyHash values; estimate = (k-1)·p / h_k). The sketch
    * shuffles ≤ k longs per group per partition where count_distinct
    * shuffles every distinct word — the 100-TB cardinality path. The
    * deterministic hash makes even the approximate estimate
    * oracle-checkable. */
  def distinctSketch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .select($"source", explode(toks(lower($"text"))).as("w"))
      .select($"source", $"w",
        ((PolyHash($"w") * KmvA + KmvB) % PolyHash.Mod).as("h"))
      .groupBy($"source")
      .agg(count_distinct($"w").as("exact_distinct"),
        graft.functions.KMinValues($"h", KmvK).as("kmv"))
      .select($"source", $"exact_distinct",
        when(size($"kmv") < KmvK, size($"kmv").cast("long"))
          .otherwise(expr(s"CAST($KmvNum DIV element_at(kmv, $KmvK) AS BIGINT)"))
          .as("kmv_estimate"))
      .orderBy($"source")
  }

  val distinctSketchSql: String =
    s"""WITH words AS (
       |  SELECT source, unnest($duckToks) AS w FROM documents),
       |hs AS (
       |  SELECT source, w,
       |    (${PolyHash.duckSql("w")} * $KmvA + $KmvB) % ${PolyHash.Mod} AS h
       |  FROM words GROUP BY source, w),
       |agg AS (
       |  SELECT source, count(*) AS exact_distinct,
       |    list_sort(list(DISTINCT h)) AS hs
       |  FROM hs GROUP BY source)
       |SELECT source, exact_distinct,
       |  CASE WHEN len(hs) < $KmvK THEN len(hs)
       |       ELSE $KmvNum // hs[$KmvK] END AS kmv_estimate
       |FROM agg ORDER BY source""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "distinct_sketch" -> (distinctSketch(_, _)),
    "text_normalize" -> (textNormalize(_, _)),
    "text_stats" -> (textStats(_, _)),
    "lang_id" -> (langId(_, _)),
    "quality_score" -> (qualityScore(_, _)),
    "doc_fingerprint" -> (docFingerprint(_, _)),
    "vocab_topk" -> (vocabTopK(_, _)),
    "heavy_hitters" -> (heavyHitters(_, _)),
    "tfidf_topk" -> (tfidfTopK(_, _)))

  def oracles: Map[String, String] = Map(
    "tfidf_topk" -> tfidfTopKSql,
    "distinct_sketch" -> distinctSketchSql,
    "text_normalize" -> textNormalizeSql,
    "text_stats" -> textStatsSql,
    "lang_id" -> langIdSql,
    "quality_score" -> qualityScoreSql,
    "doc_fingerprint" -> docFingerprintSql,
    "vocab_topk" -> vocabTopKSql,
    "heavy_hitters" -> heavyHittersSql)
}
