package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Nearest-centroid assignment as a native Catalyst expression.
  *
  * Re-expresses the reference mapper's `find_closest_centroid`
  * (mapper.py:58-66): scan centroids in id order, keep the first strictly
  * smaller squared Euclidean distance — so ties resolve to the smallest
  * centroid id, exactly like the reference's `<` comparison. sqrt is
  * dropped (monotone, same argmin).
  *
  * The centroid table rides along as two primitive double arrays embedded
  * in the generated code via `addReferenceObj` — the Spark-native analogue
  * of the master→mapper centroid broadcast (master.py:59). Code size is
  * O(1) in K (a loop, not an unrolled `when` chain), so this stays inside
  * whole-stage codegen at K=8 or K=65536.
  *
  * Returns the 1-based centroid id (reference ids are 1-based,
  * master.py:59).
  */
case class NearestCentroid(x: Expression, y: Expression,
    cxs: Array[Double], cys: Array[Double]) extends Expression {
  require(cxs.length == cys.length && cxs.nonEmpty, "need >=1 centroid")

  override def children: Seq[Expression] = Seq(x, y)
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = x.nullable || y.nullable

  override def eval(input: InternalRow): Any = {
    val xv = x.eval(input)
    val yv = y.eval(input)
    if (xv == null || yv == null) null
    else {
      val px = xv.asInstanceOf[Double]
      val py = yv.asInstanceOf[Double]
      var best = 0
      var bestD = Double.PositiveInfinity
      var i = 0
      while (i < cxs.length) {
        val dx = px - cxs(i)
        val dy = py - cys(i)
        val d = dx * dx + dy * dy
        if (d < bestD) { bestD = d; best = i }
        i += 1
      }
      best + 1
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xGen = x.genCode(ctx)
    val yGen = y.genCode(ctx)
    val cxsRef = ctx.addReferenceObj("cxs", cxs, "double[]")
    val cysRef = ctx.addReferenceObj("cys", cys, "double[]")
    val i = ctx.freshName("i")
    val best = ctx.freshName("best")
    val bestD = ctx.freshName("bestD")
    val d = ctx.freshName("d")
    val dx = ctx.freshName("dx")
    val dy = ctx.freshName("dy")
    val code =
      code"""
        ${xGen.code}
        ${yGen.code}
        boolean ${ev.isNull} = ${xGen.isNull} || ${yGen.isNull};
        int ${ev.value} = 0;
        if (!${ev.isNull}) {
          int $best = 0;
          double $bestD = Double.POSITIVE_INFINITY;
          for (int $i = 0; $i < $cxsRef.length; $i++) {
            double $dx = ${xGen.value} - $cxsRef[$i];
            double $dy = ${yGen.value} - $cysRef[$i];
            double $d = $dx * $dx + $dy * $dy;
            if ($d < $bestD) { $bestD = $d; $best = $i; }
          }
          ${ev.value} = $best + 1;
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(x = newChildren(0), y = newChildren(1))
}

object NearestCentroid {
  /** Column API: `nearest_centroid($"x", $"y", centroids)` → 1-based id. */
  def apply(x: Column, y: Column, cxs: Array[Double], cys: Array[Double]): Column =
    GraftShims.column(NearestCentroid(
      GraftShims.expression(x), GraftShims.expression(y), cxs, cys))
}
