package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: recognize the composable higher-order dot-product
  * pattern
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v) }}}
  * and rewrite it to the codegen'd native [[VectorExpressions.DotProduct]].
  *
  * Users (and the engine's own [[graft.ext.Similarity.dot]]) can write
  * the idiomatic declarative form; the optimizer swaps in the tight
  * primitive loop — the Catalyst-native way to make the slow-but-obvious
  * spelling fast, instead of forcing callers onto a custom API.
  *
  * Matching is deliberately conservative: double element types, literal
  * 0.0 seed, pure `x*y` / `acc+v` lambda bodies over exactly the lambda
  * variables, identity finish. Anything else is left untouched.
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private object MulOfVars {
    def unapply(f: Expression): Boolean = f match {
      case LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
            Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
        (x.exprId == a.exprId && y.exprId == b.exprId) ||
          (x.exprId == b.exprId && y.exprId == a.exprId)
      case _ => false
    }
  }

  private object AddOfVars {
    def unapply(f: Expression): Boolean = f match {
      case LambdaFunction(Add(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
            Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
        (x.exprId == a.exprId && y.exprId == b.exprId) ||
          (x.exprId == b.exprId && y.exprId == a.exprId)
      case _ => false
    }
  }

  private object IdentityFinish {
    def unapply(f: Expression): Boolean = f match {
      case LambdaFunction(x: NamedLambdaVariable, Seq(a: NamedLambdaVariable), _) =>
        x.exprId == a.exprId
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case agg @ ArrayAggregate(
          ZipWith(a, b, MulOfVars()),
          Literal(zero, DoubleType),
          AddOfVars(),
          IdentityFinish())
        if zero == 0.0 && isDoubleArray(a) && isDoubleArray(b) && agg.resolved =>
      VectorExpressions.DotProduct(a, b)
  }
}

/** Session extensions: inject the native vector functions and the HOF
  * rewrite rule. Activate with
  * `spark.sql.extensions=graft.functions.GraftExtensions` or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VectorExpressions.DotProduct].getName, "vec_dot"),
      (exprs: Seq[Expression]) => VectorExpressions.DotProduct(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("vec_cosine"),
      new ExpressionInfo(classOf[VectorExpressions.CosineSimilarity].getName, "vec_cosine"),
      (exprs: Seq[Expression]) => VectorExpressions.CosineSimilarity(exprs(0), exprs(1))))
    e.injectOptimizerRule(_ => RewriteHofDotProduct)
  }
}
