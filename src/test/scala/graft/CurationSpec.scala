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
}
