package graft

import org.scalatest.funsuite.AnyFunSuite

/** Curation-operator properties a single-query hash cannot express:
  * sampling is deterministic and tracks the declared rates, the
  * repetition filter actually partitions the corpus (both outcomes
  * populated), and the composed L19 pipeline equals the set-algebra
  * recomposition of its three ingredient queries' outputs.
  */
class CurationSpec extends AnyFunSuite {
  private val s = TestSpark.spark
  private val sf = TestSpark.Sf

  test("L17: hash-threshold sample is deterministic and tracks rates") {
    def ids(): Map[String, Set[Long]] =
      SparkEntry.queries("l17_stratified_sample")(s, sf).collect()
        .map(r => r.getString(1) -> r.getLong(0))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val a = ids()
    assert(a == ids(), "re-running the sample changed its contents")
    val total = graft.core.Tables.documents(s, sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rates = Map("en" -> 0.10, "de" -> 0.40, "es" -> 0.40,
                    "fr" -> 0.40, "zh" -> 0.60)
    rates.foreach { case (lang, rate) =>
      val n = total(lang)
      val got = a.getOrElse(lang, Set.empty).size.toDouble
      // 48-bit md5 buckets ≈ uniform; allow ±4σ binomial noise
      val sd = math.sqrt(n * rate * (1 - rate))
      assert(math.abs(got - n * rate) <= 4 * sd + 1,
        s"$lang: sampled $got of $n at declared rate $rate")
    }
  }

  test("L18: repetition filter populates both keep outcomes with sane metrics") {
    val rows = SparkEntry.queries("l18_repetition")(s, sf).collect()
    val keeps = rows.map(_.getBoolean(4))
    assert(keeps.contains(true) && keeps.contains(false),
      "thresholds degenerate: filter keeps everything or nothing")
    rows.foreach { r =>
      val dup = r.getDouble(2); val tb = r.getDouble(3)
      assert(dup >= 0.0 && dup < 1.0, s"dup_ratio out of range: $dup")
      assert(tb > 0.0 && tb <= 1.0, s"top_bigram_frac out of range: $tb")
    }
  }

  test("L19: pipeline equals the set-algebra recomposition of L1+L17+L18") {
    val sampled = SparkEntry.queries("l17_stratified_sample")(s, sf)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val kept = SparkEntry.queries("l18_repetition")(s, sf)
      .collect().filter(_.getBoolean(4)).map(_.getLong(0)).toSet
    val survivors = SparkEntry.queries("l1_exact_dedup")(s, sf)
      .collect().map(_.getLong(1)).toSet
    val expected = sampled.collect {
      case (id, lang) if kept(id) && survivors(id) => lang
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = SparkEntry.queries("l19_curation_pipeline")(s, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected, s"pipeline=$got recomposition=$expected")
  }

  test("L23: every injected PII item is counted and fully scrubbed") {
    import org.apache.spark.sql.functions._
    val res = SparkEntry.queries("l23_pii_redact")(s, sf).cache()
    try {
      // injection schedule: doc_id%7 → 1 email, %11 → 1 phone, %13 → 1 SSN
      val wrong = res.filter(
        col("n_email") =!= when(col("doc_id") % 7 === 0, 1L).otherwise(0L) ||
        col("n_phone") =!= when(col("doc_id") % 11 === 0, 1L).otherwise(0L) ||
        col("n_ssn") =!= when(col("doc_id") % 13 === 0, 1L).otherwise(0L))
        .count()
      assert(wrong === 0L, "a PII count disagrees with the injection schedule")
      // nothing PII-shaped survives in the redacted text
      val leaked = res.filter(
        col("clean").rlike("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}") ||
        col("clean").rlike("[0-9]{3}-[0-9]{2}-[0-9]{4}")).count()
      assert(leaked === 0L, "redacted text still matches a PII pattern")
      // placeholders appear exactly where counts say they should
      val ph = res.filter(col("n_phone") === 1L &&
        !col("clean").contains("<PHONE>")).count()
      assert(ph === 0L)
    } finally res.unpersist()
  }

  test("L24: chunks tile each document — counts, coverage, overlap") {
    import org.apache.spark.sql.functions._
    val res = SparkEntry.queries("l24_chunking")(s, sf).cache()
    try {
      val docs = graft.core.Tables.documents(s, sf)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n"))
      val byDoc = res.groupBy(col("doc_id")).agg(
        count(lit(1)).as("n_chunks"), sum(col("n_tok")).as("tok_sum"),
        max(col("chunk_id")).as("max_k"))
      val bad = byDoc.join(docs, "doc_id").filter(
        // k ranges 0..⌊(n−1)/40⌋ densely
        col("max_k") =!= floor((col("n") - 1) / 40) ||
        col("n_chunks") =!= col("max_k") + 1 ||
        // Σ n_tok = n + 10·(n_chunks−1) − trailing-overlap shortfall;
        // bound it instead of re-deriving: n ≤ Σ ≤ n + 10·(n_chunks−1)
        col("tok_sum") < col("n") ||
        col("tok_sum") > col("n") + (col("n_chunks") - 1) * 10).count()
      assert(bad === 0L, "chunk tiling violates the declared window rule")
      // every chunk's width equals min(50, n − 40k), recomputed from the
      // raw docs table (cross-checks the slice arithmetic; note chunks
      // short of 50 can occur BEFORE the last one when n mod 40 < 10,
      // because the 10-token overlap spawns a final stub chunk)
      val badWidth = res.join(docs, "doc_id")
        .filter(col("n_tok") =!= least(lit(50L), col("n") - col("chunk_id") * 40))
        .count()
      assert(badWidth === 0L, "a chunk width disagrees with min(50, n-40k)")
    } finally res.unpersist()
  }
}
