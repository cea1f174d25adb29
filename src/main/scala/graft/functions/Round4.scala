package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.types.{DataType, DoubleType}

/** The K-Means contract chain's 4-decimal rounding as a COLUMN — the one
  * `r4` definition (half away from zero via `Math.round(|v|·10⁴)`,
  * matching DuckDB `round(v, 4)`) shared between the driver-side hook
  * ([[graft.kmeans.KMeansQueries]]) and the fused in-plan Lloyd chain
  * ([[graft.kmeans.KMeans.stepsFused]]), so the two paths cannot drift.
  *
  * Not `functions.round(v, 4)`: Spark's round is BigDecimal HALF_UP on
  * the double's DECIMAL expansion, which can disagree with the
  * multiply-round-divide form on values that are a hair under a
  * half-tie in decimal but land on it in binary (e.g. the double
  * nearest 2.00005 expands to 2.0000500000…128 — BigDecimal rounds it
  * UP where `Math.round(20000.49999…)` stays DOWN). Not
  * `floor(|v|·10⁴ + 0.5)` either: JDK `Math.round` deviates from the
  * floor form on the 0.49999999999999994 adversarial point (the
  * float-add rounds up to 1.0 before floor sees it). Six rounds of
  * green hash gates pin the chain to `Math.round` semantics — this
  * expression emits exactly that, as a static call.
  */
case class Round4(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "round4"
  override def inputTypes: Seq[DataType] = Seq(DoubleType)

  override protected def nullSafeEval(v: Any): Any =
    Round4.r4(v.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.Round4.r4($v)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Round4 {
  /** Round half-AWAY-FROM-ZERO to 4 decimals — DuckDB `round()`
    * semantics (Scala's bare `math.round` rounds half toward +∞ and
    * would diverge on a negative half-tie). */
  def r4(v: Double): Double =
    math.signum(v) * (math.round(math.abs(v) * 10000) / 10000.0)

  def apply(v: Column): Column =
    GraftShims.column(Round4(GraftShims.expression(v)))
}
