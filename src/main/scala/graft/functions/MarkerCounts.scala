package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Token statistics against literal marker-word sets in ONE pass:
  * lowercase → whitespace-tokenize → emit
  * `[total_tokens, count_in_set_0, ..., count_in_set_{k-1}]`.
  *
  * The composed form — one `size(filter(split(...)))` column per set —
  * re-tokenizes the document once per set: the language-ID heuristic
  * over 5 marker sets ran `split` 5× per row (measured in the sf0.1
  * plan). One native expression is one tokenization regardless of how
  * many sets are scored, and token membership is a hash probe per set.
  * Token semantics match [[TextFeatures.toks]] (`lower` → `\s+` split
  * → drop empties), so the DuckDB oracles stay exactly as they were —
  * this is a compute-route change, not a semantic one (asserted in
  * TextAnalysisSpec against the composed form).
  */
case class MarkerCounts(child: Expression, markers: Seq[Seq[String]])
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def prettyName: String = "marker_counts"

  @transient private lazy val sets: Array[java.util.HashSet[String]] =
    MarkerCounts.buildSets(markers)

  override protected def nullSafeEval(input: Any): Any =
    MarkerCounts.compute(input.asInstanceOf[UTF8String], sets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("markerSets", sets,
      "java.util.HashSet[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.MarkerCounts.compute($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MarkerCounts {

  def buildSets(markers: Seq[Seq[String]]): Array[java.util.HashSet[String]] =
    markers.map { ws =>
      val s = new java.util.HashSet[String](ws.size * 2)
      ws.foreach(w => s.add(w))
      s
    }.toArray

  /** One pass over the text: `[nTokens, count per marker set...]`. */
  def compute(text: UTF8String, sets: Array[java.util.HashSet[String]]): ArrayData = {
    val toks = text.toLowerCase.toString.split("\\s+")
    val counts = new Array[Long](sets.length + 1)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t.nonEmpty) {
        counts(0) += 1
        var j = 0
        while (j < sets.length) {
          if (sets(j).contains(t)) counts(j + 1) += 1
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(counts.map(_.asInstanceOf[Any]))
  }

  /** Column API: `[total_tokens, count_0, ...]` for literal marker sets. */
  def apply(text: Column, markers: Seq[Seq[String]]): Column =
    GraftShims.column(MarkerCounts(GraftShims.expression(text), markers))
}
