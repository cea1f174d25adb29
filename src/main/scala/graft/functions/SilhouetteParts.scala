package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** The per-point silhouette ingredients as ONE native expression:
  * `[assigned centroid id, min squared distance, second-min squared
  * distance]` in a single O(K) loop over centroid arrays embedded via
  * `addReferenceObj` (the [[NearestCentroid]] pattern — a loop, not an
  * unrolled tree, so codegen size is O(1) in K).
  *
  * Why it exists: composing the same result from `array_sort` /
  * `array_position` over K distance columns either re-expands the K
  * distance trees per consumer (the first `least` + CASE-chain form
  * re-expanded them ~K² times, fell out of codegen, and the one-scan
  * query cost 16 s at sf0.1) or routes every row through interpreted
  * collection expressions. This loop keeps the scan inside whole-stage
  * codegen.
  *
  * Tie semantics match [[KMeansOracle.argminK]]'s first-match CASE: a
  * distance EQUAL to the current minimum does not steal the assignment
  * (first/smallest id wins) but does become the second-minimum —
  * exactly `list_sort(ds)[1..2]` multiset semantics on the oracle side.
  * Requires K ≥ 2 (a second-nearest must exist). */
case class SilhouetteParts(x: Expression, y: Expression,
    cxs: Array[Double], cys: Array[Double], ids: Array[Int])
    extends Expression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  require(cxs.length == cys.length && cxs.length == ids.length &&
    cxs.length >= 2, "need >= 2 centroids")

  // analysis-time contract (the Log2Fixed pattern): non-double children
  // get a cast inserted or a clean AnalysisException instead of a
  // runtime ClassCastException in eval/codegen
  override def inputTypes: Seq[DataType] = Seq(DoubleType, DoubleType)

  override def children: Seq[Expression] = Seq(x, y)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = x.nullable || y.nullable

  override def eval(input: InternalRow): Any = {
    val xv = x.eval(input)
    val yv = y.eval(input)
    if (xv == null || yv == null) null
    else {
      val px = xv.asInstanceOf[Double]
      val py = yv.asInstanceOf[Double]
      var best = 0
      var m1 = Double.PositiveInfinity
      var m2 = Double.PositiveInfinity
      var i = 0
      while (i < cxs.length) {
        val dx = px - cxs(i)
        val dy = py - cys(i)
        val d = dx * dx + dy * dy
        if (d < m1) { m2 = m1; m1 = d; best = i }
        else if (d < m2) { m2 = d }
        i += 1
      }
      new GenericArrayData(Array(ids(best).toDouble, m1, m2))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xGen = x.genCode(ctx)
    val yGen = y.genCode(ctx)
    val cxsRef = ctx.addReferenceObj("cxs", cxs, "double[]")
    val cysRef = ctx.addReferenceObj("cys", cys, "double[]")
    val idsRef = ctx.addReferenceObj("ids", ids, "int[]")
    val i = ctx.freshName("i")
    val best = ctx.freshName("best")
    val m1 = ctx.freshName("m1")
    val m2 = ctx.freshName("m2")
    val d = ctx.freshName("d")
    val dx = ctx.freshName("dx")
    val dy = ctx.freshName("dy")
    val cls = classOf[GenericArrayData].getName
    val code =
      code"""
        ${xGen.code}
        ${yGen.code}
        boolean ${ev.isNull} = ${xGen.isNull} || ${yGen.isNull};
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${ev.isNull}) {
          int $best = 0;
          double $m1 = Double.POSITIVE_INFINITY;
          double $m2 = Double.POSITIVE_INFINITY;
          for (int $i = 0; $i < $cxsRef.length; $i++) {
            double $dx = ${xGen.value} - $cxsRef[$i];
            double $dy = ${yGen.value} - $cysRef[$i];
            double $d = $dx * $dx + $dy * $dy;
            if ($d < $m1) { $m2 = $m1; $m1 = $d; $best = $i; }
            else if ($d < $m2) { $m2 = $d; }
          }
          ${ev.value} = new $cls(
            new double[] { (double) $idsRef[$best], $m1, $m2 });
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(x = newChildren(0), y = newChildren(1))
}

object SilhouetteParts {
  /** Column API: `[cid, d_min, d_second]` per point. */
  def apply(x: Column, y: Column, cxs: Array[Double], cys: Array[Double],
      ids: Array[Int]): Column =
    GraftShims.column(SilhouetteParts(
      GraftShims.expression(x), GraftShims.expression(y), cxs, cys, ids))
}
