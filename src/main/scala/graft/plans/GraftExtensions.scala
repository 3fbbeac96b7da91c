package graft.plans

import graft.functions.LongDotProduct
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Catalyst optimizer rule: rewrite the built-in higher-order-function
  * spelling of an integer dot product,
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)
  *
  * into the native codegen expression [[graft.functions.LongDotProduct]].
  *
  * Why a Rule and not "just call the fast function": users (and SQL
  * frontends) write the declarative spelling; higher-order functions run
  * interpreted per element with no common-subexpression elimination, which
  * dominates all-pairs similarity joins (O(pairs × dims) lambda
  * invocations). The rewrite must preserve semantics exactly, and the
  * two spellings differ on unequal-length inputs (`zip_with` null-pads
  * the shorter side so the sum goes NULL; `long_dot` dots the common
  * prefix) and on overflow under ANSI mode (exception vs silent wrap).
  * The rule is therefore deliberately conservative: it fires only for
  * SELF-dots — `left` semantically equal to `right`, the norm
  * computation in [[graft.ext.Similarity.prepared]] and the hottest
  * spelling — where lengths are equal by construction and quantized
  * magnitudes cannot overflow. Everything else is left untouched.
  *
  * This is the pattern for the engine's extension surface: semantics from
  * built-ins, performance from a Rule + native Expression pair, activated
  * with `spark.sql.extensions=graft.plans.GraftExtensions` (or
  * `spark.experimental.extraOptimizations` on a live session).
  */
object RewriteLongDotProduct extends Rule[LogicalPlan] {

  private def isLongArray(e: Expression): Boolean = e.dataType match {
    // containsNull must be false: on a NULL element the HOF spelling
    // returns NULL (zip_with's multiply nulls the slot, the aggregate
    // add propagates it), while LongDotProduct reads the slot as if it
    // held a value and fabricates a finite sum. A session-wide rule must
    // never change a user query's result, so nullable-element arrays are
    // left to the built-in path.
    case ArrayType(LongType, containsNull) => !containsNull
    case _                                 => false
  }

  private object MulLambda {
    def unapply(f: Expression): Boolean = f match {
      case LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
        Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
        (x.exprId == a.exprId && y.exprId == b.exprId) ||
          (x.exprId == b.exprId && y.exprId == a.exprId)
      case _ => false
    }
  }

  private object AddLambda {
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
    case ArrayAggregate(
          ZipWith(left, right, MulLambda()),
          Literal(0L, LongType),
          AddLambda(),
          IdentityFinish())
        if isLongArray(left) && isLongArray(right) && left.semanticEquals(right) =>
      LongDotProduct(left, right)
  }
}

/** Session-extension entry point:
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => RewriteLongDotProduct)
    // UPDATE/MERGE assignment alignment for graft-log tables (the
    // ACCEPT_ANY_SCHEMA capability suppresses Spark's own alignment
    // rule; see GraftRowLevelAlignment's doc)
    ext.injectResolutionRule(_ =>
      org.apache.spark.sql.catalyst.analysis.GraftRowLevelAlignment)
  }
}
