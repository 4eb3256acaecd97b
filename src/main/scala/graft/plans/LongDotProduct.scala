package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.internal.SQLConf
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
  * Semantics are an EXACT match for the declarative chain
  * `aggregate(zip_with(a, b, (x, y) => x * y), 0L, (acc, v) => acc + v)`
  * — load-bearing since r14, because DotProductRewrite swaps one for the
  * other inside the optimizer and a rewrite must be an identity:
  *  - null input array → null (standard BinaryExpression);
  *  - DIFFERING lengths → null (zip_with pads the shorter side with
  *    nulls, the padded product is null, and null poisons the sum);
  *  - any null ELEMENT → null (same poisoning);
  *  - overflow: under ANSI (`failOnError`, captured from the session
  *    conf like Spark's own Add) both forms THROW (this one a plain
  *    ArithmeticException, Spark's a SparkArithmeticException — value
  *    behavior identical, error class differs); under legacy both WRAP.
  *    Crucially (r16, the advisor's null+overflow edge): zip_with
  *    evaluates EVERY overlapping non-null pair's product before the
  *    fold ever sees a null, so a null element or a length mismatch
  *    does NOT shield an overflowing pair elsewhere in the overlap
  *    from throwing. Under failOnError this loop therefore keeps
  *    running multiplyExact over all overlapping non-null pairs after
  *    a null/mismatch is seen and only then returns null — null
  *    short-circuits only the ADDITIONS (the fold stops accumulating
  *    at the first null product, exactly like `aggregate`'s
  *    null-poisoned acc). The one residual divergence is throw ORDER
  *    when both an add- and a later mul-overflow exist (declaratively
  *    all products evaluate before any addition; here they interleave)
  *    — both sides still throw, so value behavior stays identical.
  *    Legacy mode wraps, so the legacy path keeps the cheap
  *    first-null short-circuit (no observable difference).
  */
case class LongDotProduct(left: Expression, right: Expression,
                          failOnError: Boolean = SQLConf.get.ansiEnabled)
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
  // null can arise from length mismatch / null elements even when both
  // inputs are non-null — nullable unconditionally
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val xn = x.numElements()
    val yn = y.numElements()
    if (failOnError) {
      // ANSI: every overlapping non-null pair must pass multiplyExact
      // (zip_with evaluates all products before the fold sees a null),
      // additions stop at the first null product — see scaladoc.
      val n = math.min(xn, yn)
      var acc = 0L
      var nullSeen = false
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) nullSeen = true
        else {
          val p = Math.multiplyExact(x.getLong(i), y.getLong(i))
          if (!nullSeen) acc = Math.addExact(acc, p)
        }
        i += 1
      }
      if (nullSeen || xn != yn) null else acc
    } else {
      if (xn != yn) return null
      var acc = 0L
      var i = 0
      while (i < xn) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        acc += x.getLong(i) * y.getLong(i)
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val xn = ctx.freshName("xn")
      val yn = ctx.freshName("yn")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val ns = ctx.freshName("nullSeen")
      val p = ctx.freshName("p")
      if (failOnError)
        // ANSI mirror of nullSafeEval: multiplyExact every overlapping
        // non-null pair even after a null/mismatch; additions stop at
        // the first null product.
        s"""
           |int $xn = $x.numElements();
           |int $yn = $y.numElements();
           |int $n = java.lang.Math.min($xn, $yn);
           |long $acc = 0L;
           |boolean $ns = false;
           |for (int $i = 0; $i < $n; $i++) {
           |  if ($x.isNullAt($i) || $y.isNullAt($i)) {
           |    $ns = true;
           |  } else {
           |    long $p = java.lang.Math.multiplyExact($x.getLong($i), $y.getLong($i));
           |    if (!$ns) { $acc = java.lang.Math.addExact($acc, $p); }
           |  }
           |}
           |if ($ns || $xn != $yn) { ${ev.isNull} = true; }
           |else { ${ev.value} = $acc; }
         """.stripMargin
      else
        s"""
           |int $n = $x.numElements();
           |long $acc = 0L;
           |if ($n != $y.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  for (int $i = 0; $i < $n; $i++) {
           |    if ($x.isNullAt($i) || $y.isNullAt($i)) {
           |      ${ev.isNull} = true; break;
           |    }
           |    $acc += $x.getLong($i) * $y.getLong($i);
           |  }
           |}
           |if (!${ev.isNull}) { ${ev.value} = $acc; }
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

/** `SparkSessionExtensions` hook — injectable via config. r14 adds the
  * optimizer rule: a session built with this extension rewrites the
  * declarative dot-product chain to the native expression automatically
  * (see DotProductRewrite). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((GraftFunctions.ident, GraftFunctions.info,
      GraftFunctions.builder))
    ext.injectOptimizerRule(_ => DotProductRewrite)
  }
}
