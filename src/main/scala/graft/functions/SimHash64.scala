package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** 62-bit SimHash over a token array (occurrence-weighted):
  *
  *   per token w:  h(w) = polyhash(w, 31) | (polyhash(w, 131) << 31)
  *   per bit b:    acc(b) += (h(w) bit b set ? +1 : -1)
  *   fingerprint:  bit b set iff acc(b) > 0
  *
  * One pass over the tokens, no shuffle, fully inside whole-stage codegen
  * — the per-document map stage of the simhash near-dup operator
  * (SURVEY.md §2.C dedup_simhash). The two [[PolyHash]] folds are
  * portable, so the identical fingerprint is computable in DuckDB SQL
  * (unnest tokens → group per word with counts → 62-bit accumulator),
  * which is what makes the operator oracle-checkable.
  *
  * 62 bits (not 64) because each half comes from a mod-(2^31-1) hash:
  * the fingerprint stays a non-negative Long in both engines.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def dataType: DataType = LongType
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(org.apache.spark.sql.types.StringType))
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {
  val Bits = 62

  /** The accumulation loop — shared by interpreted eval and codegen. */
  def compute(tokens: ArrayData): Long = {
    val acc = new Array[Int](Bits)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val w = tokens.getUTF8String(i)
      val h = PolyHash.hash(w, 31L) | (PolyHash.hash(w, 131L) << 31)
      var b = 0
      while (b < Bits) {
        if (((h >> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < Bits) {
      if (acc(b) > 0) fp |= 1L << b
      b += 1
    }
    fp
  }

  /** Column API over an `array<string>` token column. */
  def apply(c: Column): Column =
    GraftShims.column(SimHash64(GraftShims.expression(c)))
}
