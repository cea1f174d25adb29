package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.types.{DataType, LongType}

/** `-log2(a/b)` for integers `1 <= a <= b`, in fixed-point units of
  * 2^-16 — computed WITHOUT any transcendental function, so the value
  * is bit-identical across engines and the language-model cross-entropy
  * built on it stays under the DuckDB hash gate (SURVEY.md §5).
  *
  * `ln`/`log2`/`pow` are the one class of libm calls that IEEE 754 does
  * NOT require to be correctly rounded: Spark's `Math.log` and DuckDB's
  * `std::log` may disagree in the last ulp, which is exactly the
  * "astronomically small but nonzero" hash-flip the round-5 advisor had
  * this repo purge from the multimodal aggregates. This expression
  * sidesteps the entire problem: the classic shift-and-square binary
  * logarithm uses only integer arithmetic plus IEEE multiply/divide —
  * all of which ARE correctly rounded everywhere — so every engine that
  * follows the recipe produces the same 64-bit result:
  *
  *   1. e  = min { k : a*2^k >= b }        (pure integer, e <= 63)
  *   2. m  = (a << e) / b  in [1, 2)       (one exact-input division)
  *   3. 16×: m = m*m; bit = m >= 2; if bit, m /= 2   (frac bits of log2 m)
  *   4. result = e*65536 - fracbits        (truncated toward +inf)
  *
  * The DuckDB mirror is [[Log2Fixed.duckUnroll]] — the same 16 steps as
  * chained subselects (linear, not exponential, expression growth).
  *
  * Codegen emits a static call; the loop lives in compiled bytecode on
  * the LM-scoring scan's hot path (one call per DISTINCT smoothed
  * bigram, not per token — the caller aggregates first).
  */
case class Log2Fixed(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def dataType: DataType = LongType
  override def prettyName: String = "log2_fixed"
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Log2Fixed.bits(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Log2Fixed.bits($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Log2Fixed {
  /** Fractional bits kept (fixed-point scale = 2^16). */
  val Scale: Long = 65536L

  /** The algorithm itself — requires `1 <= a <= b < 2^50` (the LM caller
    * guarantees a = count+1, b = context+vocab). Every float op is an
    * IEEE-exact multiply/divide on exactly-representable inputs.
    *
    * Out-of-contract inputs fail LOUDLY: the expression is also the
    * public `log2_fixed` SQL function ([[graft.GraftExtensions]]), and
    * without the guard a=0 died on a bare div-by-zero while a>b or
    * b >= 2^50 silently returned garbage (negative costs / an inexact
    * mantissa) — the advisor-flagged silent-wrong class. */
  def bits(a: Long, b: Long): Long = {
    if (a < 1L || a > b || b >= (1L << 50))
      throw new IllegalArgumentException(
        s"log2_fixed(a=$a, b=$b): contract is 1 <= a <= b < 2^50 " +
          "(-log2(a/b) of a probability as an exact integer ratio)")
    val q = (b + a - 1) / a // = ceil(b/a), so 2^e >= q  <=>  a*2^e >= b
    var e = 0
    while ((1L << e) < q) e += 1
    var m = (a << e).toDouble / b.toDouble // in [1, 2)
    var f = 0L
    var i = 0
    while (i < 16) {
      m = m * m
      f <<= 1
      if (m >= 2.0) { f |= 1L; m = m * 0.5 }
      i += 1
    }
    e * Scale - f
  }

  def apply(a: Column, b: Column): Column =
    GraftShims.column(Log2Fixed(GraftShims.expression(a), GraftShims.expression(b)))

  /** DuckDB mirror: wraps relation-SQL `inner` (must expose BIGINT
    * columns `a` and `b`; all other columns are carried through) in the
    * identical shift-and-square recipe, adding column `lbits`.
    * `(1::BIGINT << e)` and `printf('%b', …)` keep step 1 in integers;
    * steps 2–3 are the same exact-rounded double ops as [[bits]]. */
  def duckUnroll(inner: String): String = {
    val q = s"SELECT *, (b + a - 1) // a AS qq FROM ($inner)"
    val e = "SELECT * EXCLUDE (qq), CASE WHEN qq = 1 THEN 0 ELSE " +
      s"length(printf('%b', qq - 1)) END AS e FROM ($q)"
    val m0 = "SELECT *, CAST(a * (CAST(1 AS BIGINT) << e) AS DOUBLE) / " +
      s"CAST(b AS DOUBLE) AS m, CAST(0 AS BIGINT) AS f FROM ($e)"
    val stepped = (1 to 16).foldLeft(m0) { (acc, _) =>
      "SELECT * EXCLUDE (m, f), " +
        "CASE WHEN m*m >= 2 THEN m*m/2 ELSE m*m END AS m, " +
        s"2*f + CASE WHEN m*m >= 2 THEN 1 ELSE 0 END AS f FROM ($acc)"
    }
    s"SELECT * EXCLUDE (m, f, e), e * $Scale - f AS lbits FROM ($stepped)"
  }
}
