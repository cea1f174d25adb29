package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Subword (BPE-style) token count of a whitespace-tokenized string —
  * the round-5 verdict's "tokenizer-aware token accounting": training-
  * sequence budgets are TOKEN budgets, and whitespace counts mis-size
  * packing by 20-40% on real text, so [[graft.operators.CorpusOps]]'s
  * packing/mix twins (`pack_sequences_bpe`, `source_mix_bpe`) budget
  * with this count instead.
  *
  * Algorithm: per whitespace word, GREEDY LEFT-TO-RIGHT INCREMENTAL
  * MATCH against the fixed PREFIX-CLOSED vocabulary [[Subword.Vocab]] —
  * the buffer extends with the next character while `buffer + c` is a
  * vocab member, else the buffer is emitted as one token and restarts
  * at `c`; single characters are always tokens of last resort. This is
  * how a trained BPE/WordPiece merge table is APPLIED greedily at
  * tokenization time, with the merge structure expressed as the closure
  * of each unit's prefixes (a unit is reachable only through its
  * prefix chain — "window" via wi→win→wind→windo→window — exactly a
  * merge sequence; the table is [[Subword.BaseUnits]], the repo's
  * literal "merge table"). Prefix-closure makes the viability test a
  * plain membership test, which is what keeps the DuckDB oracle an
  * exact mirror: a `list_reduce` character fold carrying (count,
  * buffer) with `list_contains(VOCAB, buf || c)` ([[Subword.duckDoc]]).
  *
  * Determinism/portability: pure function of the string and the literal
  * vocab — no trained state, no RNG, identical on every engine,
  * partitioning-independent. ASCII corpus assumed (the testdata is
  * printable ASCII; Java chars and DuckDB grapheme split agree there).
  * Codegen emits one static call per document (the split + fold loops
  * live in [[Subword.count]]), staying inside whole-stage codegen. */
case class SubwordTokens(child: Expression,
    units: Seq[String] = Subword.BaseUnits)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  override def dataType: DataType = LongType
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def prettyName: String = "subword_tokens"

  // prefix-closed membership set for THIS expression's unit table
  // (the fixed literal table by default; `bpe_train`'s learned merges
  // for the *_learned twins)
  @transient private lazy val vocabSet = Subword.closedSet(units)

  override protected def nullSafeEval(input: Any): Any =
    Subword.count(input.asInstanceOf[UTF8String], vocabSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vocabSet", vocabSet, "java.util.HashSet")
    defineCodeGen(ctx, ev, c => s"graft.functions.Subword.count($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Subword {
  import org.apache.spark.sql.{Column, GraftShims}

  def apply(c: Column): Column =
    GraftShims.column(SubwordTokens(GraftShims.expression(c)))

  /** Subword count under an explicit unit table (prefix-closed here) —
    * the learned-merge apply path. */
  def apply(c: Column, units: Seq[String]): Column =
    GraftShims.column(SubwordTokens(GraftShims.expression(c), units))

  /** The merge table: multi-character subword units a greedy pass can
    * emit. Common English bigrams/suffixes plus corpus-domain words —
    * linguistic quality is NOT load-bearing (the operators only need a
    * deterministic, portable, sub-whitespace token measure); the fixed
    * literal table is the contract. Prefixes are closed over in
    * [[Vocab]] so every unit is reachable through its merge chain. */
  val BaseUnits: Seq[String] = Seq(
    // frequent English units
    "the", "and", "ing", "ion", "tion", "ation", "ent", "ers", "est",
    "ed", "es", "er", "an", "in", "on", "at", "en", "or", "ar", "al",
    "it", "is", "of", "to", "ou", "le", "st", "ll", "ch", "sh", "th",
    "wh", "qu", "re", "ra", "ro", "li", "ne", "se", "ma", "me", "ur",
    "ce", "de", "co", "pa", "ge", "nt", "us", "be", "wi", "fo", "pr",
    "ke", "wo", "ba", "sp", "gr", "sc", "pl", "fi", "bi", "di", "va",
    "ow", "ig", "ag", "nd", "rt", "ey", "ate", "all", "ast", "ash",
    "ine", "low", "ort", "can", "der",
    // corpus-domain words (documents.parquet vocabulary)
    "value", "spark", "batch", "group", "sort", "hash", "scan",
    "filter", "query", "window", "column", "order", "small", "fast",
    "slow", "line", "key", "big", "agg", "part", "join", "shuffle",
    "merge", "cache", "table", "index")

  /** Prefix closure of [[BaseUnits]] (every prefix of length ≥ 2),
    * sorted — membership in this set IS the greedy extension test. */
  val Vocab: Seq[String] =
    BaseUnits.flatMap(u => (2 to u.length).map(u.substring(0, _)))
      .distinct.sorted

  /** Prefix closure (length ≥ 2) of a unit table as the membership
    * set the greedy fold tests — closure is what makes "extend while
    * member" equivalent to applying the merge chain. */
  def closedSet(units: Seq[String]): java.util.HashSet[String] = {
    val closed = units.flatMap(u => (2 to u.length).map(u.substring(0, _)))
    val s = new java.util.HashSet[String](closed.size * 2)
    closed.foreach(s.add)
    s
  }

  private val vocabSet: java.util.HashSet[String] = closedSet(BaseUnits)

  /** Java regex `\s` membership — the `toks` splitter's classes
    * (DuckDB's RE2 `\s` lacks U+000B, which the corpus never holds). */
  private def isSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' ||
      c == '\f' || c == '\r'

  /** Whitespace-split + greedy subword count, one call per document.
    * Whitespace = Java regex `\s` classes, matching the engine's
    * `toks` splitter (and DuckDB's `\s+` on this ASCII corpus). */
  def count(text: UTF8String): Long = count(text, vocabSet)

  /** [[count]] under an explicit prefix-closed membership set. */
  def count(text: UTF8String, vocab: java.util.HashSet[String]): Long = {
    val s = text.toString
    val n = s.length
    var total = 0L
    var i = 0
    while (i < n) {
      if (isSpace(s.charAt(i))) {
        i += 1
      } else {
        var j = i + 1
        while (j < n && !isSpace(s.charAt(j))) j += 1
        total += countWord(s, i, j, vocab)
        i = j
      }
    }
    total
  }

  /** Greedy fold over one word: extend the buffer while `buf + c` is a
    * vocab member, else emit and restart at `c`. */
  private def countWord(s: String, from: Int, until: Int,
      vocab: java.util.HashSet[String]): Long = {
    var cnt = 0L
    var bufStart = from
    var k = from + 1
    while (k < until) {
      if (vocab.contains(s.substring(bufStart, k + 1))) ()
      else { cnt += 1; bufStart = k }
      k += 1
    }
    if (bufStart < until) cnt += 1
    cnt
  }

  /** The SQL literal list mirroring [[Vocab]]. */
  val duckVocab: String =
    Vocab.map(v => s"'$v'").mkString("[", ", ", "]")

  /** DuckDB per-document subword count over token-list expression
    * `toksExpr` (e.g. [[TextFeatures.duckToks]]) — the EXACT mirror of
    * [[count]]: per word, a `list_reduce` character fold whose
    * accumulator is `"<count><US><buffer>"` (US = chr(31), absent from
    * the printable-ASCII corpus, so the state parse is unambiguous),
    * then a BIGINT sum over words.
    *
    * The fold runs over `w || '~'`: the appended TERMINATOR can never
    * extend a buffer (the vocab is strictly lowercase letters, so
    * `buf || '~'` is never a member — the same failed-membership path
    * the Java loop takes on any non-vocab character), so it forces the
    * final buffer emission INSIDE the fold and the word's count is one
    * `split_part` of the result — no scalar subquery in the lambda. A
    * literal '~' inside a word behaves identically on both engines
    * (membership fails, buffer restarts). */
  def duckDoc(toksExpr: String): String = duckDoc(toksExpr, duckVocab)

  /** [[duckDoc]] over an explicit vocab-list SQL expression (a column
    * carrying the prefix-closed unit list — the learned-merge twins
    * cross-join a 1-row closure CTE so the lambda references a plain
    * column, not a subquery). The terminator argument requires that no
    * vocab member contains '~' — the learned-unit extraction filters
    * them out on both engines. */
  def duckDoc(toksExpr: String, vocabExpr: String): String = {
    val word = duckWord("w", vocabExpr)
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform($toksExpr, w -> $word)), (a, x) -> a + x)"
  }

  /** The single-word greedy fold as a SQL scalar over word expression
    * `wExpr` — the core [[duckDoc]] maps over a document's tokens, and
    * what [[duckDocCte]] evaluates once per DISTINCT corpus word. */
  def duckWord(wExpr: String, vocabExpr: String = duckVocab): String = {
    // no stripMargin anywhere here: the generated SQL is full of `||`
    // concatenations, and a continuation line starting with `||` loses
    // a pipe to an OUTER template's margin stripping when embedded —
    // compose plain single-line pieces instead
    val us = "chr(31)"
    def cntOf(a: String) = s"split_part($a, $us, 1)"
    def bufOf(a: String) = s"split_part($a, $us, 2)"
    val step =
      s"CASE WHEN ${bufOf("acc")} != '' " +
        s"AND list_contains($vocabExpr, ${bufOf("acc")} || c) " +
        s"THEN ${cntOf("acc")} || $us || ${bufOf("acc")} || c " +
        s"WHEN ${bufOf("acc")} = '' THEN ${cntOf("acc")} || $us || c " +
        s"ELSE CAST(CAST(${cntOf("acc")} AS BIGINT) + 1 AS VARCHAR) " +
        s"|| $us || c END"
    val fold = s"list_reduce(list_prepend('0' || $us, " +
      s"string_split($wExpr || '~', '')), (acc, c) -> $step)"
    s"CAST(${cntOf(fold)} AS BIGINT)"
  }

  /** Oracle-side CTE chain ending in `sdoc(doc_id, subw)` = per-document
    * subword totals over `documents`, with the per-character greedy fold
    * evaluated ONCE PER DISTINCT WORD (`swcnt`, MATERIALIZED) and summed
    * back through an occurrence join — the round-12-verdict #6 sf10
    * oracle-timeout fix: the inline [[duckDoc]] scalar re-ran the fold
    * per word OCCURRENCE (~10⁸ folds at sf10, the suite's most expensive
    * scalar pipeline), where the distinct-word domain is ~10⁴. A
    * document with zero tokens has no `sdoc` row — consumers LEFT JOIN
    * and coalesce to 0 (the empty-list fold's value). Oracle-side only;
    * the Spark operator already runs [[Subword]] codegen per row. */
  def duckDocCte(toksExpr: String): String =
    s"""stok AS MATERIALIZED (
       |  SELECT doc_id, tk[pos] AS w
       |  FROM (SELECT doc_id, $toksExpr AS tk FROM documents) sdk,
       |    unnest(range(1, len(tk) + 1)) AS u(pos)),
       |swcnt AS MATERIALIZED (
       |  SELECT w, ${duckWord("w", duckVocab)} AS wsub
       |  FROM (SELECT DISTINCT w FROM stok) sw),
       |sdoc AS MATERIALIZED (
       |  SELECT o.doc_id, CAST(sum(c.wsub) AS BIGINT) AS subw
       |  FROM stok o JOIN swcnt c USING (w)
       |  GROUP BY o.doc_id)""".stripMargin
}
