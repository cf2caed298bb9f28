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

/** Optimizer rule: recognize the declarative top-k-per-key window
  * pattern
  * {{{ Filter(rank <= k, Window(rank := row_number() OVER (PARTITION BY keys ORDER BY o))) }}}
  * and replace both nodes with the custom [[graft.plans.TopKPerKey]]
  * logical operator, planned by [[graft.plans.TopKPerKeyStrategy]] as a
  * partial/final bounded-heap pair — the shuffle then carries at most
  * k rows per key per map partition instead of every candidate row, and
  * nothing ever fully sorts a key's row set. Output attributes (incl.
  * the rank attribute's id) are preserved, so downstream references are
  * untouched.
  *
  * Conservative matching: exactly one window expression, plain
  * `row_number()` with the default running frame, the filter condition
  * alone bounds that rank attribute with a literal (`<=` / `<`), and a
  * positive k. Anything else stays a Window.
  */
object RewriteWindowTopK extends Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.plans.logical.{Filter, Window}

  private object RankBound {
    import org.apache.spark.sql.types.LongType

    /** The bounded rank reference: bare, or behind a lossless
      * int→long cast (the `row_number().cast("long")` spelling).
      */
    private object RankRef {
      def unapply(e: Expression): Option[Attribute] = e match {
        case a: Attribute => Some(a)
        case Cast(a: Attribute, LongType, _, _) => Some(a)
        case _ => None
      }
    }

    /** Extracts (rankAttr, k) from the filter condition. */
    def unapply(cond: Expression): Option[(Attribute, Int)] = cond match {
      case LessThanOrEqual(RankRef(a), Literal(k: Int, _)) => Some((a, k))
      case LessThan(RankRef(a), Literal(k: Int, _)) => Some((a, k - 1))
      case LessThanOrEqual(RankRef(a), Literal(k: Long, _)) if k <= Int.MaxValue =>
        Some((a, k.toInt))
      case LessThan(RankRef(a), Literal(k: Long, _)) if k <= Int.MaxValue =>
        Some((a, k.toInt - 1))
      // the argmax spelling: rank == 1 is exactly rank <= 1 (r10 —
      // Pq.encode/keepBest ran a full Window because only </<= matched)
      case EqualTo(RankRef(a), Literal(1, _)) => Some((a, 1))
      case EqualTo(Literal(1, _), RankRef(a)) => Some((a, 1))
      case EqualTo(RankRef(a), Literal(1L, _)) => Some((a, 1))
      case EqualTo(Literal(1L, _), RankRef(a)) => Some((a, 1))
      case _ => None
    }
  }

  /** Above this bound the pattern is pagination, not top-k: the heap
    * holds k rows per key per partition, so the memory win over the
    * (spilling) window evaporates as k grows.
    */
  private val MaxRewriteK = 1000

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond,
          w @ Window(Seq(alias @ Alias(WindowExpression(_: RowNumber,
            WindowSpecDefinition(_, _,
              SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _)),
            partitionSpec, orderSpec, child, _))
        if orderSpec.nonEmpty =>
      // the tightest rank bound becomes the operator's k; every other
      // conjunct (rank still in scope) stays as a residual filter above
      val conjuncts = splitConjunctivePredicates(cond)
      val ks = conjuncts.collect {
        case RankBound(a, k) if a.exprId == alias.exprId => k
      }
      if (ks.isEmpty || ks.min < 1 || ks.min > MaxRewriteK) f
      else {
        val rest = conjuncts.filter {
          case RankBound(a, _) if a.exprId == alias.exprId => false
          case _ => true
        }
        val topk = graft.plans.TopKPerKey(
          ks.min, partitionSpec, orderSpec, alias.toAttribute, child)
        rest.reduceOption(And).map(Filter(_, topk)).getOrElse(topk)
      }
  }
}

/** Optimizer rule: push key-predicate filters below [[graft.plans.TopKPerKey]].
  *
  * Catalyst pushes deterministic partition-key predicates through
  * `Window`; a custom operator loses that for free, so this rule
  * restores it. Safe exactly when the predicate references only keys
  * that are bare attributes: every row of a key group then shares the
  * predicate's inputs, so filtering groups before or after the top-k
  * selects the same rows — and pushing lets the predicate reach the
  * scan (partition pruning / parquet filters) instead of discarding
  * rows after the heaps did their work.
  */
object PushFilterThroughTopK extends Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, t: graft.plans.TopKPerKey) =>
      val keyAttrs = AttributeSet(t.keys.collect { case a: Attribute => a })
      val (push, keep) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic && p.references.nonEmpty &&
          p.references.subsetOf(keyAttrs))
      if (push.isEmpty) f
      else {
        val pushed = t.copy(child = Filter(push.reduce(And), t.child))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** Session extensions: inject the native vector functions, the HOF
  * rewrite rule, and the window-top-k operator (rule + strategy).
  * Activated engine-wide via `spark.sql.extensions` in
  * [[graft.Sessions.tuned]], or per session with
  * `SparkSession.builder().withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    // builders validate arity explicitly: the injectFunction seq would
    // otherwise silently ignore extra arguments (a caller-passed seed
    // would be discarded with no diagnostic)
    def arity(name: String, n: Int)(exprs: Seq[Expression]): Seq[Expression] = {
      require(exprs.length == n,
        s"$name takes exactly $n argument(s), got ${exprs.length}")
      exprs
    }
    e.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VectorExpressions.DotProduct].getName, "vec_dot"),
      (exprs: Seq[Expression]) => {
        val Seq(a, b) = arity("vec_dot", 2)(exprs)
        VectorExpressions.DotProduct(a, b)
      }))
    e.injectFunction((
      FunctionIdentifier("vec_cosine"),
      new ExpressionInfo(classOf[VectorExpressions.CosineSimilarity].getName, "vec_cosine"),
      (exprs: Seq[Expression]) => {
        val Seq(a, b) = arity("vec_cosine", 2)(exprs)
        VectorExpressions.CosineSimilarity(a, b)
      }))
    e.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[TextHashExpressions.SimHash64Expr].getName, "simhash64"),
      (exprs: Seq[Expression]) =>
        TextHashExpressions.SimHash64Expr(arity("simhash64", 1)(exprs).head)))
    e.injectFunction((
      FunctionIdentifier("rolling_xxhash64"),
      new ExpressionInfo(classOf[TextHashExpressions.RollingXxHash64].getName, "rolling_xxhash64"),
      (exprs: Seq[Expression]) =>
        TextHashExpressions.RollingXxHash64(
          arity("rolling_xxhash64", 1)(exprs).head, 42L)))
    e.injectOptimizerRule(_ => RewriteHofDotProduct)
    e.injectOptimizerRule(_ => RewriteWindowTopK)
    e.injectOptimizerRule(_ => PushFilterThroughTopK)
    e.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
  }
}
