package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType
import graft.functions.DotProduct

/** Optimizer rule: rewrite the idiomatic higher-order-function dot
  * product
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, x) -> acc + x)
  *
  * into the codegen'd [[graft.functions.DotProduct]] — same fold order,
  * same doubles, ~5× faster (HOF lambdas are interpreted and allocate an
  * intermediate array per row; see DotProduct's scaladoc).
  *
  * This is the engine's `Rule[LogicalPlan]` extension point in action
  * (registered by [[graft.GraftExtensions]] via
  * `injectOptimizerRule`): users write the declarative form; the plan
  * they run is the native one. The guards are strict — any deviation
  * (different zero, non-identity finish, lambda vars used oddly) leaves
  * the expression untouched.
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  private object IdentityLambda {
    def unapply(e: Expression): Boolean = e match {
      case LambdaFunction(v: NamedLambdaVariable, Seq(a: NamedLambdaVariable), _) =>
        v.exprId == a.exprId
      case _ => false
    }
  }

  /** Lambda (p, q) -> p OP q over exactly its own two variables, either
    * order. */
  private def isVarPair(l: Expression, r: Expression,
      a: NamedLambdaVariable, b: NamedLambdaVariable): Boolean =
    (l, r) match {
      case (x: NamedLambdaVariable, y: NamedLambdaVariable) =>
        (x.exprId == a.exprId && y.exprId == b.exprId) ||
        (x.exprId == b.exprId && y.exprId == a.exprId)
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(ml, mr, _),
                Seq(zx: NamedLambdaVariable, zy: NamedLambdaVariable), _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(al, ar, _),
              Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable), _),
            IdentityLambda())
          if isVarPair(ml, mr, zx, zy) && isVarPair(al, ar, acc, el) &&
            a.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] &&
            a.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
              .elementType == DoubleType &&
            b.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
              .elementType == DoubleType =>
        DotProduct(a, b)
    }
}
