package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, EvalMode, Expression, LambdaFunction, Literal, Multiply, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Optimizer rule (SURVEY §7.4's next rung after the custom Expression):
  * rewrite the DECLARATIVE exact-integer dot product
  *
  *   `aggregate(zip_with(a, b, (x, y) => x * y), 0L, (acc, v) => acc + v)`
  *
  * into the native codegen'd `LongDotProduct(a, b)` — so a user who
  * writes the idiomatic higher-order-function form (Llm.qdot, or the
  * same thing in SQL text) gets the fused no-allocation loop without
  * knowing `graft_dot` exists. The rewrite is an IDENTITY by
  * construction: LongDotProduct's null/length/overflow semantics were
  * made to match the chain exactly (see its scaladoc) — PlanSpec "X5"
  * pins both the plan swap and value equality on the edge inputs (null
  * array, null element, length mismatch).
  *
  * Guards: both arrays must already be `array<bigint>` (the analyzer
  * inserts casts otherwise, breaking the shape), the fold zero must be
  * the long literal 0, both lambdas must be the exact multiply/add
  * shapes over their own bound variables (commutative orders accepted),
  * the finish lambda must be the identity the 3-arg aggregate() form
  * installs, and the arithmetic must not be in TRY mode (try_add /
  * try_multiply suppress overflow errors — the native loop has no TRY
  * variant, so that shape is left alone). ANSI vs legacy overflow mode
  * is carried from the matched Add/Multiply into `failOnError`.
  *
  * Registration: session-build via GraftExtensions, or post-hoc on an
  * existing session via `DotProductRewrite.ensure` (the public
  * `spark.experimental.extraOptimizations` hook), which the x5 query
  * entry uses so any driver-supplied session works.
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def isLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  /** body is a product/sum of exactly the two bound lambda variables
    * (either order). Returns the shared EvalMode when it matches
    * (Spark 4.1 wraps it in NumericEvalContext). */
  private def twoVarOp(body: Expression,
                       a1: NamedLambdaVariable, a2: NamedLambdaVariable)
      : Option[EvalMode.Value] = body match {
    case Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, ctx)
        if Set(x.exprId, y.exprId) == Set(a1.exprId, a2.exprId) =>
      Some(ctx.evalMode)
    case Add(x: NamedLambdaVariable, y: NamedLambdaVariable, ctx)
        if Set(x.exprId, y.exprId) == Set(a1.exprId, a2.exprId) =>
      Some(ctx.evalMode)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(l, r,
              LambdaFunction(mulBody,
                Seq(x1: NamedLambdaVariable, x2: NamedLambdaVariable), _)),
            Literal(0L, LongType),
            LambdaFunction(addBody,
              Seq(m1: NamedLambdaVariable, m2: NamedLambdaVariable), _),
            LambdaFunction(fin: NamedLambdaVariable,
              Seq(f1: NamedLambdaVariable), _))
          if isLongArray(l) && isLongArray(r) &&
            fin.exprId == f1.exprId &&
            mulBody.isInstanceOf[Multiply] && addBody.isInstanceOf[Add] &&
            twoVarOp(mulBody, x1, x2).exists(_ != EvalMode.TRY) &&
            twoVarOp(addBody, m1, m2).exists(_ != EvalMode.TRY) &&
            twoVarOp(mulBody, x1, x2) == twoVarOp(addBody, m1, m2) =>
        LongDotProduct(l, r,
          failOnError = twoVarOp(addBody, m1, m2).contains(EvalMode.ANSI))
    }

  /** Post-hoc injection for an already-built session (the public
    * ExperimentalMethods hook; idempotent). */
  def ensure(spark: SparkSession): Unit = synchronized {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(DotProductRewrite))
      spark.experimental.extraOptimizations = cur :+ DotProductRewrite
  }
}
