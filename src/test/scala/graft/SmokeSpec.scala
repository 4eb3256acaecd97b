package graft

import org.scalatest.funsuite.AnyFunSuite

/** t1 smoke tier (SURVEY §5.2): every declared query runs at sf0.001 and
  * returns a sane frame. Queries whose result is legitimately empty at
  * this scale are listed explicitly — anything else must be non-empty.
  */
class SmokeSpec extends AnyFunSuite {
  private val mayBeEmpty = Set(
    "l1_exact_dedup", // no exact dupes is fine — group count == doc count
    "l10_minhash_lsh", "l12_raretoken_neardup", "l13_embed_neardup",
    "l2_tokenset_neardup", // near-dup pair counts are data-dependent
    "j5_anti", "u2_intersect", "u5_intersect_all", "u3_except", "p2_filter",
    "s5_interval_join", "s8_funnel", "j7_range"
  )

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(TestSpark.spark, TestSpark.Sf)
      assert(df.schema.nonEmpty, s"$name: empty schema")
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name: returned 0 rows")
    }
  }

  test("every oracle key has a matching query") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracle SQL without a query: $dangling")
  }

  test("entry() returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(TestSpark.spark).count() > 0)
  }
}
