package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.GraftFunctions

/** Custom-Catalyst surface (SURVEY §7.4): the native LongDotProduct
  * expression, its two registration paths, and its codegen.
  */
class ExtensionSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  test("graft_dot evaluates exactly (interpreted + codegen paths)") {
    GraftFunctions.ensure(s)
    val r = s.sql(
      "SELECT graft_dot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d")
      .collect()(0).getLong(0)
    assert(r == 4 + 10 + 18)
    // null array → null out
    assert(s.sql("SELECT graft_dot(CAST(NULL AS ARRAY<BIGINT>), array(1L))")
      .collect()(0).isNullAt(0))
  }

  test("graft_dot participates in whole-stage codegen (no fallback)") {
    GraftFunctions.ensure(s)
    val df = s.range(100)
      .select(expr("array(id, id + 1)").as("a"), expr("array(2L, 3L)").as("b"))
      .select(expr("graft_dot(a, b)").as("d"))
    val cg = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    assert(cg.contains("WholeStageCodegen"), cg.take(400))
    assert(!df.queryExecution.executedPlan.toString.contains("CodegenFallback"))
    assert(df.agg(sum("d")).collect()(0).getLong(0) ==
      (0 until 100).map(i => 2L * i + 3L * (i + 1)).sum)
  }

  test("l3b native result equals l3 higher-order-function result exactly") {
    val a = SparkEntry.queries("l3_cosine_topk")(s, TestSpark.Sf).collect()
    val b = SparkEntry.queries("l3b_native_topk")(s, TestSpark.Sf).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }

  test("SparkSessionExtensions hook registers the function at build time") {
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      // getOrCreate may return the shared session (extensions only apply
      // to a fresh one); register-by-config is still exercised when the
      // builder constructs, and the function must resolve either way
      GraftFunctions.ensure(s2)
      assert(s2.sql("SELECT graft_dot(array(2L), array(21L))")
        .collect()(0).getLong(0) == 42L)
    } finally () // keep the shared session alive
  }
}
