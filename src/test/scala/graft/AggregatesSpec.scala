package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables

/** t3 property checks for sketch/float aggregates (SURVEY §2.4): the
  * declared A4 exclusion (no oracle hash) is replaced by a tolerance
  * check against the exact A3, and the float builtins (stddev/corr) are
  * checked against the exact-integer-moment formulas of a7_stats.
  */
class AggregatesSpec extends AnyFunSuite {
  private val s = TestSpark.spark
  private val sf = TestSpark.Sf

  test("A4 approx_count_distinct within 5% of A3 exact") {
    val exact = SparkEntry.queries("a3_distinct")(s, sf)
      .select(col("event_type"), col("n_users")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = SparkEntry.queries("a4_approx_distinct")(s, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e <= 0.05,
        s"$k: approx=$a exact=$e (>5% off)")
    }
  }

  test("a7_stats exact formulas match Spark's stats builtins " +
       "(stddev_samp/corr/var_samp/covar_samp/skewness)") {
    val exact = SparkEntry.queries("a7_stats")(s, sf).collect()(0)
    val q = col("l_quantity").cast("long")
    val dc = (col("l_discount") * 100).cast("long")
    val builtin = Tables.lineitem(s, sf).agg(
      stddev_samp(q).as("sd"), corr(q, dc).as("c"),
      var_samp(q).as("v"), covar_samp(q, dc).as("cv"),
      skewness(q).as("sk")).collect()(0)
    assert(math.abs(exact.getDouble(2) - builtin.getDouble(0)) < 1e-9)
    assert(math.abs(exact.getDouble(3) - builtin.getDouble(1)) < 1e-6)
    assert(math.abs(exact.getDouble(4) - builtin.getDouble(2)) < 1e-6)
    assert(math.abs(exact.getDouble(5) - builtin.getDouble(3)) < 1e-6)
    assert(math.abs(exact.getDouble(6) - builtin.getDouble(4)) < 1e-6)
  }

  test("A12 approx percentiles within 1% of A8's exact interpolated values") {
    val exact = SparkEntry.queries("a8_percentile")(s, sf).collect()
      .map(r => r.getDouble(1))
    val approx = SparkEntry.queries("a12_approx_percentile")(s, sf)
      .collect().sortBy(_.getInt(0)).map(_.getDouble(1))
    assert(exact.length == 3 && approx.length == 3)
    exact.zip(approx).foreach { case (e, a) =>
      assert(math.abs(a - e) / e <= 0.01,
        f"approx percentile off: exact=$e%.2f approx=$a%.2f")
    }
  }

  test("A8 at 2000 shuffle partitions: same percentiles, no codegen " +
       "fallback") {
    // the scale-proof pid→offset mapping is a broadcast join on a tiny
    // (pid, offset) DF; the when-chain it replaced would be a 2000-deep
    // expression tree here. codegen.fallback=false turns any silent
    // interpreted-mode fallback into a loud failure.
    val pKey = "spark.sql.shuffle.partitions"
    val fKey = "spark.sql.codegen.fallback"
    val prevP = s.conf.get(pKey)
    val prevF = s.conf.getOption(fKey)
    try {
      s.conf.set(pKey, "2000")
      s.conf.set(fKey, "false")
      val wide = SparkEntry.queries("a8_percentile")(s, sf).collect()
        .map(r => (r.getDouble(0), r.getDouble(1))).toSeq
      s.conf.set(pKey, prevP)
      val base = SparkEntry.queries("a8_percentile")(s, sf).collect()
        .map(r => (r.getDouble(0), r.getDouble(1))).toSeq
      // exact global ranks: the result must be partition-count-invariant
      assert(wide == base, s"2000-partition run diverged: $wide vs $base")
    } finally {
      s.conf.set(pKey, prevP)
      prevF.fold(s.conf.unset(fKey))(v => s.conf.set(fKey, v))
    }
  }

  test("a14 group sizes stay inside the probed percentile_disc " +
       "agreement range (n <= 300)") {
    // Spark's percentile_disc rule (smallest value with cume_dist >= p)
    // and DuckDB's were probed to select the SAME index at p=0.9 for
    // every n = 1..300 (see the a14 query comment). The a14 input
    // (orders with o_orderkey < 100) must keep its groups inside that
    // probed range, or the definitional-agreement claim lapses.
    val sizes = Tables.orders(s, sf).filter(col("o_orderkey") < 100)
      .groupBy(col("o_orderstatus")).count()
      .collect().map(_.getLong(1))
    assert(sizes.nonEmpty && sizes.forall(n => n >= 1 && n <= 300),
      s"a14 group sizes out of probed range: ${sizes.mkString(",")}")
  }

  test("L10 and L12 find the same verified near-dup pairs") {
    // two independent candidate generators (MinHash-LSH bands vs
    // rare-token blocking) must agree on the >= 0.95-Jaccard pairs
    val a = SparkEntry.queries("l10_minhash_lsh")(s, sf)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = SparkEntry.queries("l12_raretoken_neardup")(s, sf)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b, s"LSH-only: ${a -- b}; blocking-only: ${b -- a}")
  }

  test("L1 dedup is idempotent (survivor set stable under re-dedup)") {
    val survivors = SparkEntry.queries("l1_exact_dedup")(s, sf)
      .agg(count(lit(1)), sum(col("n"))).collect()(0)
    val docs = Tables.documents(s, sf).count()
    assert(survivors.getLong(1) == docs) // every doc in exactly one group
  }

  test("A15: exact weighted median equals an in-memory reference and " +
       "satisfies the defining mass inequality on both sides") {
    val rows = Tables.lineitem(s, sf)
      .select("l_returnflag", "l_quantity", "l_extendedprice").collect()
      .map(r => (r.getString(0), r.getDouble(1).toLong,
        math.round(r.getDouble(2) * 100)))
    val ref = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (f, g) =>
      val byQ = g.groupBy(_._2).view.mapValues(_.map(_._3).sum).toSeq
        .sortBy(_._1)
      val tot = byQ.map(_._2).sum
      var cum = 0L
      val med = byQ.collectFirst {
        case (q, w) if { cum += w; 2 * cum >= tot } => q
      }.get
      (f, med, tot)
    }
    val got = SparkEntry.queries("a15_weighted_median")(s, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq
    assert(got == ref, s"engine $got vs ref $ref")
    // the defining property, checked independently of the scan order:
    // mass strictly below the median < half; mass up to it >= half
    got.foreach { case (f, med, tot) =>
      val below = rows.filter(r => r._1 == f && r._2 < med).map(_._3).sum
      val upTo = rows.filter(r => r._1 == f && r._2 <= med).map(_._3).sum
      assert(2 * below < tot, s"$f: median too high")
      assert(2 * upTo >= tot, s"$f: median too low")
    }
  }
}
