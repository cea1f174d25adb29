package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-grams of a text column in ONE native pass:
  * lowercase → split on `\s+` → drop empties → n-grams joined by a
  * single space → distinct (first occurrence kept).
  *
  * Semantically equal to the composed column form
  * `array_distinct(transform(sequence(...), i => concat_ws(" ",
  * slice(toks, i+1, n))))` over `filter(split(lower(text), "\\s+"), ...)`
  * — and to the DuckDB oracle ([[TextFeatures.duckNgrams]]) — but as a
  * single codegen'd expression it cannot be torn apart by the optimizer.
  * That matters: `InferFiltersFromGenerate` clones a generator's input
  * expression into a pushed-down filter, and alias inlining then nests
  * the tokenizer INSIDE the transform lambda, re-tokenizing the document
  * once per gram (measured ~10× slowdown of the sf0.1 dedup scans). A
  * single opaque expression is evaluated at most twice per row (filter +
  * project), each evaluation one linear pass.
  */
case class WordNgrams(child: Expression, n: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  require(n >= 1, "n-gram size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def prettyName: String = "word_ngrams"

  override protected def nullSafeEval(input: Any): Any =
    WordNgrams.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordNgrams.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordNgrams {
  /** One pass: tokenize (Spark `lower` + `split("\\s+")` semantics,
    * empties dropped) and emit distinct space-joined n-grams in first-
    * occurrence order. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toLowerCase.toString.split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](toks.length * 2)
    var i = 0
    val last = toks.length - n
    val sb = new java.lang.StringBuilder(64)
    while (i <= last) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  /** Column API: distinct word n-grams of a raw text column. */
  def apply(text: Column, n: Int): Column =
    GraftShims.column(WordNgrams(GraftShims.expression(text), n))
}
