package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Sequential left-to-right dot product of two `array<double>` columns —
  * the inner loop of every similarity/dedup operator over embeddings.
  *
  * Semantically identical to
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` INCLUDING the null cases —
  * zip_with pads the shorter array with nulls and null poisons the sum,
  * so unequal lengths or any null element yield NULL here too. That
  * equivalence is what licenses [[graft.plans.RewriteDotProduct]] to
  * substitute this expression for the HOF pattern. Same element-order
  * double additions ⇒ DuckDB-oracle parity unchanged (SURVEY.md §5);
  * the HOFs are interpreted closures allocating an intermediate array
  * per row, this is a codegen'd static loop (measured ~5× faster on the
  * sf0.1 embedding pair scans).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.dotOrNull(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("dp")
      s"""
         |java.lang.Double $boxed = graft.functions.DotProduct.dotOrNull($a, $b);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** The fold — shared by interpreted eval and generated code. Returns
    * null (as the HOF form does) on length mismatch or null elements. */
  def dotOrNull(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }

  def apply(a: Column, b: Column): Column =
    GraftShims.column(DotProduct(GraftShims.expression(a), GraftShims.expression(b)))

  /** Euclidean norm via the same sequential fold (= `sqrt(dot(v, v))`). */
  def norm(v: Column): Column = sqrt(apply(v, v))
}
