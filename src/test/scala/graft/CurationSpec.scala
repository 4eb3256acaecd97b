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

  test("L32: compression signal is bounded, deterministic, and " +
       "repetition compresses strictly better") {
    def deflate(t: String): Long = {
      val d = new java.util.zip.Deflater(6)
      val in = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      d.reset(); d.setInput(in); d.finish()
      val buf = new Array[Byte](1 << 16)
      var n = 0L
      while (!d.finished()) n += d.deflate(buf)
      d.end(); n
    }
    val rows = SparkEntry.queries("l32_compress_ratio")(s, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, raw, comp) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(raw > 0 && comp > 0, s"doc $id: empty sizes")
      // deflate's worst case is stored blocks: tiny fixed overhead
      assert(comp <= raw + 64, s"doc $id: comp $comp > raw $raw + slack")
    }
    // determinism + engine/driver agreement: the distributed kernel must
    // byte-match a driver-side deflate of the same text
    val sample = graft.core.Tables.documents(s, sf)
      .select("doc_id", "text").limit(20).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val byId = rows.map(r => r.getLong(0) -> r.getLong(2)).toMap
    sample.foreach { case (id, text) =>
      assert(byId(id) == deflate(text), s"doc $id: kernel/driver mismatch")
    }
    // the signal detects repetition: doubling a document must compress
    // to well under twice the singleton size (the back-reference window
    // covers the repeat) — this is what makes the ratio a quality filter
    sample.take(10).foreach { case (id, text) =>
      assert(deflate(text + " " + text) < 2 * deflate(text),
        s"doc $id: self-repetition did not compress better")
    }
  }

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

  test("L25: packing conserves tokens, respects capacity, and numbers " +
       "bins densely") {
    import org.apache.spark.sql.functions._
    val res = SparkEntry.queries("l25_seq_pack")(s, sf).cache()
    try {
      // capacity: a bin exceeds 256 tokens only as a single-doc bin
      assert(res.filter(col("n_tokens") > 256 && col("n_docs") > 1)
        .count() === 0L, "a multi-doc bin exceeds the 256-token capacity")
      // conservation: per (lang, block), bin tokens sum to doc tokens
      val docTok = graft.core.Tables.documents(s, sf)
        .select(col("lang"), (col("doc_id") / 1000).cast("long").as("block"),
          size(split(col("text"), " ")).cast("long").as("nt"))
        .groupBy(col("lang"), col("block"))
        .agg(sum(col("nt")).as("want"), count(lit(1)).as("want_docs"))
      val got = res.groupBy(col("lang"), col("block"))
        .agg(sum(col("n_tokens")).as("got"), sum(col("n_docs")).as("got_docs"),
          max(col("bin_id")).as("max_bin"), count(lit(1)).as("n_bins"))
      val bad = got.join(docTok, Seq("lang", "block"), "full")
        .filter(col("got") =!= col("want") ||
          col("got_docs") =!= col("want_docs") ||
          col("n_bins") =!= col("max_bin") + 1).count()
      assert(bad === 0L, "token/doc conservation or dense bin ids violated")
      // the packing actually packs: fewer bins than docs
      val nb = res.count()
      val nd = graft.core.Tables.documents(s, sf).count()
      assert(nb < nd, s"packing produced $nb bins for $nd docs")
    } finally res.unpersist()
  }

  test("L26: deciles are balanced and keep rates track (d+1)*10%") {
    val rows = SparkEntry.queries("l26_quality_resample")(s, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq === (0L to 9L),
      "expected exactly deciles 0..9")
    val sizes = rows.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1, s"unbalanced deciles: ${sizes.toSeq}")
    rows.foreach { r =>
      val (d, n, kept) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val rate = (d + 1) * 10 / 100.0
      if (rate == 1.0) assert(kept === n, s"decile 9 must keep everything")
      else {
        val sd = math.sqrt(n * rate * (1 - rate))
        assert(math.abs(kept - n * rate) <= 4 * sd + 1,
          s"decile $d kept $kept of $n at declared rate $rate")
      }
    }
  }

  test("L30: mixture weights normalize to 1, stay monotone in token " +
       "counts, and the τ=0.5 temperature compresses the spread") {
    val rows = SparkEntry.queries("l30_domain_mix")(s, sf).collect()
    assert(rows.length > 1, "need multiple sources to mix")
    val ws = rows.map(_.getAs[Double]("weight"))
    assert(math.abs(ws.sum - 1.0) < 1e-9,
      s"weights must sum to 1, got ${ws.sum}")
    val byTok = rows.sortBy(_.getAs[Long]("n_tokens"))
      .map(_.getAs[Double]("weight"))
    assert(byTok.zip(byTok.tail).forall { case (a, b) => a <= b },
      "weight must be monotone in the source's token count")
    val toks = rows.map(_.getAs[Long]("n_tokens").toDouble)
    // w ∝ sqrt(tokens): the weight ratio between the largest and smallest
    // source must be the sqrt of their token ratio, not the raw ratio
    assert(ws.max / ws.min <= math.sqrt(toks.max / toks.min) * (1 + 1e-3),
      "temperature 0.5 must compress the proportional spread")
  }

  test("L35: the epoch shard plan is reproducible and balanced") {
    import graft.SparkEntry
    val q = SparkEntry.queries("l35_epoch_shards")
    val a = q(s, sf).collect().map(_.toString)
    val b = q(s, sf).collect().map(_.toString)
    // same seed → byte-identical plan on a re-run (the operator's whole
    // point: training order must not depend on cluster layout or luck)
    assert(a.sameElements(b), "same-seed shard plan not reproducible")
    val rows = q(s, sf).collect()
    val n = rows.map(_.getAs[Long]("n_docs")).sum
    val sz = (n + 15) / 16
    // ceil-split balance: every shard but the last holds exactly sz docs
    val sizes = rows.sortBy(_.getAs[Long]("shard")).map(_.getAs[Long]("n_docs"))
    assert(sizes.init.forall(_ == sz) && sizes.last == n - sz * (sizes.length - 1),
      s"shards unbalanced: ${sizes.mkString(",")}")
    // positions cover 0..size-1 within each shard (first 0, last size-1)
    rows.foreach { r =>
      assert(r.getAs[Long]("first_pos") == 0L &&
        r.getAs[Long]("last_pos") == r.getAs[Long]("n_docs") - 1,
        s"shard ${r.getAs[Long]("shard")} positions not contiguous")
    }
  }

  test("L41: every injected boilerplate line is stripped and every " +
       "clean content line survives") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("l41_boilerplate")(s, sf)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    val docs = s.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.size == docs.length)
    docs.foreach { case (id, text) =>
      val (nLines, nRemoved, clean) = out(id)
      val injected = Seq(id % 4 == 0, id % 5 == 0, id % 6 == 0).count(identity)
      assert(nLines == 1 + injected, s"doc $id line count")
      // no boilerplate marker survives the strip
      assert(!clean.contains("http") && !clean.contains("|") &&
             !clean.contains("copyright"), s"doc $id kept boilerplate: $clean")
      // on this corpus every content line is stopword-dense enough to
      // survive, so the strip removes EXACTLY the injected lines and
      // returns the original text — a positive proof both ways
      assert(nRemoved == injected, s"doc $id removed $nRemoved != $injected")
      assert(clean == text, s"doc $id content line altered")
    }
  }

  test("L41 rule edges: separator fraction and short-stopword-free " +
       "thresholds are exact-integer") {
    import org.apache.spark.sql.functions._
    import s.implicits._
    // stops = {the}; lines exercise each rule boundary
    val lines = Seq(
      "a | b c d",                  // n=5, sep=1: 1·5 ≥ 5 → removed
      "a | b c d e f g h i j",      // n=11, sep=1: 5 < 11, not short → kept
      "x y z q w r s t u",          // n=9 < 10, stop=0 → removed
      "x y z q w r s t u v",        // n=10 → kept (not short)
      "the y z q w r s t u",        // n=9, stop=1: 20 ≥ 9 → kept
      "see http://a.b now")         // link token → removed
    val df = Seq((lines.mkString("\n"), Seq("the")))
      .toDF("t", "stops")
      .withColumn("lines", split(col("t"), "\n"))
      .withColumn("kept", expr(graft.llm.Curation.KeptLinesExpr))
    val kept = df.select(col("kept")).collect()(0).getSeq[String](0)
    assert(kept == Seq(lines(1), lines(3), lines(4)), kept.toString)
  }
}
