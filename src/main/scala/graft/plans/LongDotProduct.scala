package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst expression: exact integer dot product of two
  * `array<bigint>` columns (the quantized-embedding workhorse of the
  * L-series). SURVEY §7.4 reserved custom Expressions as the escape hatch
  * "only if a declared function is missing from builtins" — builtins DO
  * express this (`aggregate(zip_with(...))`, see Llm.qdot), but that
  * formulation allocates an intermediate array per row and evaluates a
  * lambda per element. This expression generates a tight fused loop
  * inside whole-stage codegen: no allocation, no virtual calls —
  * preference order (b) from the build rules (native Expression > UDF).
  *
  * Null semantics: null input array → null result (standard
  * BinaryExpression null-intolerance); elements are assumed non-null
  * (quantized vectors are produced dense by Llm.qz). Lengths may differ —
  * the loop runs over the shorter (same as zip_with's null-padding would
  * contribute nothing here).
  */
case class LongDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // ExpectsInputTypes would be the idiomatic mixin, but AbstractDataType
  // is private[sql] in Spark 4 — equivalent manual check instead.
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects (array<bigint>, array<bigint>), " +
        s"got (${left.dataType.sql}, ${right.dataType.sql})")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $x.getLong($i) * $y.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Registration, two ways (both public API):
  *  - `spark.sql.extensions=graft.plans.GraftExtensions` at session build
  *  - `GraftFunctions.ensure(spark)` on an already-built session (used by
  *    the query entries so any driver-supplied session works)
  */
object GraftFunctions {
  val ident = FunctionIdentifier("graft_dot")
  val info = new ExpressionInfo(
    classOf[LongDotProduct].getName, null, "graft_dot",
    "graft_dot(a, b) - exact dot product of two array<bigint> vectors",
    "")
  val builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, "graft_dot takes exactly 2 arguments")
    LongDotProduct(exprs(0), exprs(1))
  }

  def ensure(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(ident))
      reg.registerFunction(ident, info, builder)
  }
}

/** `SparkSessionExtensions` hook — injectable via config. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((GraftFunctions.ident, GraftFunctions.info,
      GraftFunctions.builder))
}
