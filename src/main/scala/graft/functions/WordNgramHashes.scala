package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-n-gram HASHES of a text column in one native pass:
  * tokenize like [[WordNgrams]], then fold each gram through the two
  * independent-base [[PolyHash]] polynomials and pack them into one
  * 62-bit long (`h31 | h131 << 31`). Output is sorted ascending and
  * de-duplicated.
  *
  * This is the set-similarity verify representation: intersecting long
  * arrays costs a fraction of intersecting ~20-byte gram strings, and
  * the arrays themselves are 5-10× smaller through every join and
  * broadcast. Two different grams collide only with probability ~2^-62;
  * a collision changes the Jaccard by collapsing two set elements — and
  * because the DuckDB oracle computes THE SAME hashes
  * ([[PolyHash.duckSql]] over the reproduced grams), even a collision
  * leaves both engines in agreement.
  *
  * The per-gram fold runs over the gram's code points exactly as
  * [[PolyHash.hash]] does (separator space included), so
  * `WordNgramHashes(text, n)` ≡ sorted-distinct
  * `transform(WordNgrams(text, n), g -> PolyHash(g,31) | PolyHash(g,131) << 31)`
  * — asserted in DedupSpec — without materializing a single gram string.
  */
case class WordNgramHashes(child: Expression, n: Int,
    sortedDistinct: Boolean = true)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  require(n >= 1, "n-gram size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def prettyName: String = "word_ngram_hashes"

  override protected def nullSafeEval(input: Any): Any =
    WordNgramHashes.compute(input.asInstanceOf[UTF8String], n, sortedDistinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WordNgramHashes.compute($c, $n, $sortedDistinct)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordNgramHashes {
  private val P = PolyHash.Mod

  /** One pass: tokenize, hash each n-gram with both bases over its code
    * points (tokens joined by a single space, like [[WordNgrams]]),
    * return the sorted distinct packed hashes — or, with
    * `sortedDistinct = false`, every gram's hash in POSITION order
    * (index i = the gram starting at token i; duplicates kept), the
    * representation the span pipeline explodes: positions survive, and
    * no gram string is ever materialized (the composed
    * wordNgrams→PolyHash form spent ~4 s/sweep at sf0.1 allocating and
    * re-decoding gram strings). */
  def compute(text: UTF8String, n: Int, sortedDistinct: Boolean = true): ArrayData = {
    val toks = text.toLowerCase.toString.split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val m = toks.length - n + 1
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h31 = 0L
      var h131 = 0L
      var j = 0
      while (j < n) {
        if (j > 0) {
          h31 = (h31 * 31 + ' ') % P
          h131 = (h131 * 131 + ' ') % P
        }
        val t = toks(i + j)
        var k = 0
        while (k < t.length) {
          val cp = t.codePointAt(k)
          h31 = (h31 * 31 + cp) % P
          h131 = (h131 * 131 + cp) % P
          k += Character.charCount(cp)
        }
        j += 1
      }
      hs(i) = h31 | (h131 << 31)
      i += 1
    }
    if (!sortedDistinct) {
      val outPos = new Array[Any](m)
      i = 0
      while (i < m) { outPos(i) = hs(i); i += 1 }
      return new GenericArrayData(outPos)
    }
    java.util.Arrays.sort(hs)
    // in-place dedup of the sorted array
    var w = 0
    i = 0
    while (i < m) {
      if (w == 0 || hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    val out = new Array[Any](w)
    i = 0
    while (i < w) { out(i) = hs(i); i += 1 }
    new GenericArrayData(out)
  }

  /** Column API: sorted distinct 62-bit n-gram hashes of a text column. */
  def apply(text: Column, n: Int): Column =
    GraftShims.column(WordNgramHashes(GraftShims.expression(text), n))

  /** Column API: every gram's hash in position order, duplicates kept
    * (element i = the gram starting at token i). */
  def positional(text: Column, n: Int): Column =
    GraftShims.column(
      WordNgramHashes(GraftShims.expression(text), n, sortedDistinct = false))

  /** DuckDB SQL producing the identical packed hash for a gram string
    * expression (for oracles): h31 + h131 · 2^31. */
  def duckSql(gramExpr: String): String =
    s"(${PolyHash.duckSql(gramExpr)} + ${PolyHash.duckSql(gramExpr, 131)} * 2147483648)"
}
