package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables

/** Training-data curation operators L17–L19, L23–L26, L30: the selection /
  * filtering / shaping stages that sit between the dedup family
  * (L1/L10–L13/L22) and a training run. All are map-side, 2-phase-
  * aggregate, or bounded-group shapes — no all-pairs, no driver data
  * loops — and every score stays integer-exact until one final IEEE
  * division, so each query is fully oracle-hashed.
  *
  *  - L17 stratified sampling: DETERMINISTIC hash-threshold sampling
  *    (md5(doc_id) % 100 < per-language rate). Unlike `DataFrame.sample`
  *    (partition-local RNG: resample on retry, engine-private), the keep
  *    decision is a pure function of the row — reproducible across
  *    engines, retries, and re-runs, which is what a 100 TB pipeline
  *    needs for auditable data lineage. The per-language rate table is a
  *    broadcast dim (upsample low-resource languages, downsample the
  *    head — the standard LLM-corpus rebalancing move).
  *  - L18 repetition filter (Gopher-style): duplicate-token ratio +
  *    top-bigram fraction per document; keep = both under threshold.
  *    Bigram construction is a per-doc window (bounded partitions, same
  *    argument as L16); everything else is 2-phase groupBy.
  *  - L19 the composed pipeline: exact-dedup survivors → repetition
  *    filter → stratified sample → per-language corpus stats. One
  *    declarative plan, so Catalyst fuses the stages (scan once, no
  *    materialization between them) — the point of expressing a
  *    curation pipeline as DataFrames rather than scripted passes.
  *  - L23 PII redaction (r6): portable-regex scrub of emails, phone
  *    numbers and SSN-shaped ids. The synthetic corpus carries no
  *    natural PII, so the canonical query first INJECTS deterministic
  *    PII derived from doc_id arithmetic (the s8b funnel-injection
  *    pattern: the oracle reproduces the injection exactly, making the
  *    redaction provably fire rather than vacuously matching on zero
  *    hits). Pure per-row projection — map-side at any scale.
  *  - L24 chunking (r6): fixed-size sliding token windows (50 tokens,
  *    stride 40 ⇒ 10-token overlap) — the standard context-window
  *    packing prep for pretraining/RAG. explode(sequence) + slice keeps
  *    it one codegen'd projection; rows out ≈ n_tokens/stride, no
  *    shuffle until the caller aggregates.
  *  - L25 sequence packing (r6): greedy first-fit concatenation of
  *    short documents into 256-token training windows — the packing
  *    pass that turns a curated corpus into fixed-context samples.
  *    Packing is BLOCK-LOCAL by declaration: docs are packed in doc_id
  *    order within (lang, ⌊doc_id/1000⌋) blocks, so every group handed
  *    to the sequential greedy scan is bounded (≤1000 docs) no matter
  *    the corpus size — the same boundedness contract X4's mapGroups
  *    declares. (Exact GLOBAL greedy packing is inherently sequential;
  *    block-local is what production packers do, trading a sliver of
  *    fill efficiency for embarrassing parallelism.)
  *  - L26 quality resampling (r6): exact global quality deciles via the
  *    a8 machinery (range repartition + broadcast per-partition offsets
  *    → global rank with NO single-task window), then deterministic
  *    hash-threshold keep at rate (decile+1)·10 % — the quality-pacing
  *    mix step (keep more of the best text) with L17's auditable
  *    sampling rule.
  */
object Curation {

  /** Deterministic sampling bucket in [0, 100): 48-bit md5 prefix of the
    * decimal doc_id, mod 100 — portable integer arithmetic (same
    * construction as DedupExt's token hash). */
  private def sampleBucket: Column =
    conv(substring(md5(col("doc_id").cast(StringType)), 1, 12), 16, 10)
      .cast(LongType) % 100

  /** Per-language sampling rates (percent kept): downsample the English
    * head, upsample the low-resource tail. Tiny broadcast dim. */
  private def rates(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(("en", 10L), ("de", 40L), ("es", 40L), ("fr", 40L), ("zh", 60L))
      .toDF("lang", "rate")
  }

  /** Per-document repetition metrics (L18 core, shared with L19):
    * (doc_id, lang, n_tok, dup_ratio, top_bigram_frac, keep). Thresholds
    * 0.55 / 0.05 straddle the corpus medians (0.54 / 0.033), so both
    * keep outcomes are populated at every sf. */
  private def repetition(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val toks = split(col("text"), " ")
    val base = docs.filter(size(toks) > 1)
      .select(col("doc_id"), col("lang"),
        size(toks).cast(LongType).as("n_tok"),
        size(array_distinct(toks)).cast(LongType).as("n_uniq"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val bigrams = docs.select(col("doc_id"), posexplode(toks))
      .withColumn("nxt", lead(col("col"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .select(col("doc_id"),
        concat_ws("|", col("col"), col("nxt")).as("bigram"))
    val top = bigrams.groupBy(col("doc_id"), col("bigram"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("top_c"))
    base.join(top, "doc_id")
      .select(col("doc_id"), col("lang"), col("n_tok"),
        (lit(1.0) - col("n_uniq").cast(DoubleType) /
          col("n_tok").cast(DoubleType)).as("dup_ratio"),
        (col("top_c").cast(DoubleType) /
          (col("n_tok") - 1).cast(DoubleType)).as("top_bigram_frac"))
      .withColumn("keep",
        col("dup_ratio") <= 0.55 && col("top_bigram_frac") <= 0.05)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // L17 — deterministic stratified sample. 100 TB: the filter is pure
    // map-side row arithmetic against a broadcast rate table — zero
    // shuffle, and the sample is stable under task retries (a partition-
    // local RNG sample is not).
    "l17_stratified_sample" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("bucket", sampleBucket)
        .join(broadcast(rates(s)), "lang")
        .filter(col("bucket") < col("rate"))
        .select(col("doc_id"), col("lang"), col("source"), col("bucket"))
        .orderBy(col("doc_id"))),

    // L18 — repetition-based quality filter (Gopher-style duplicate-token
    // ratio + top-bigram fraction).
    "l18_repetition" -> ((s, d) =>
      repetition(s, d)
        .select(col("doc_id"), col("n_tok"), col("dup_ratio"),
          col("top_bigram_frac"), col("keep"))
        .orderBy(col("doc_id"))),

    // L19 — the composed curation pipeline: dedup → quality → sample →
    // per-language corpus stats. Each stage reuses the canonical
    // operator's exact rule (L1 survivor = min doc_id per sha256; L18
    // keep; L17 bucket<rate), so this query also pins that the operators
    // COMPOSE without re-materialization.
    "l19_curation_pipeline" -> ((s, d) => {
      val survivors = Tables.documents(s, d)
        .withColumn("hsh", sha2(lower(trim(col("text"))), 256))
        .groupBy(col("hsh")).agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id"))
      repetition(s, d)
        .join(survivors, "doc_id")
        .filter(col("keep"))
        .withColumn("bucket", sampleBucket)
        .join(broadcast(rates(s)), "lang")
        .filter(col("bucket") < col("rate"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
        .orderBy(col("lang"))
    }),

    // L19b — the pipeline with a NEAR-dup removal stage composed in
    // (added r4): exact-dedup survivors ∩ token-set-near-dup survivors
    // (L2's order-insensitive signature, survivor = min doc_id per
    // cluster) → repetition filter → stratified sample → stats. Both
    // dedup stages are plain hash-groupBys, so the whole pipeline is
    // still ONE declarative plan; at 100 TB the banded MinHash verify
    // (l10b) slots into the same survivor position when near-dup means
    // J ≥ t rather than exact-set equality.
    "l19b_curation_neardup" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val exactSurv = docs
        .withColumn("hsh", sha2(lower(trim(col("text"))), 256))
        .groupBy(col("hsh")).agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id"))
      val nearSurv = docs
        .withColumn("sig", sha2(concat_ws(" ",
          array_sort(array_distinct(split(col("text"), " ")))), 256))
        .groupBy(col("sig")).agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id"))
      repetition(s, d)
        .join(exactSurv, "doc_id")
        .join(nearSurv, "doc_id")
        .filter(col("keep"))
        .withColumn("bucket", sampleBucket)
        .join(broadcast(rates(s)), "lang")
        .filter(col("bucket") < col("rate"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
        .orderBy(col("lang"))
    }),

    // L23 — PII redaction with deterministic injection. Redaction order
    // (emails → phones → SSNs) is part of the declared semantics; counts
    // are taken BEFORE redaction. The phone pattern is anchored by the
    // +1- prefix so the SSN pattern (3-2-4 digits) cannot overlap it.
    "l23_pii_redact" -> ((s, d) => {
      val t = concat(col("text"),
        when(col("doc_id") % 7 === 0,
          concat(lit(" contact user"), col("doc_id").cast(StringType),
                 lit("@example.com now"))).otherwise(lit("")),
        when(col("doc_id") % 11 === 0,
          concat(lit(" call +1-415-"),
            lpad(((col("doc_id") * 37) % 1000).cast(StringType), 3, "0"),
            lit("-"),
            lpad(((col("doc_id") * 73) % 10000).cast(StringType), 4, "0")))
          .otherwise(lit("")),
        when(col("doc_id") % 13 === 0,
          concat(lit(" id "),
            lpad(((col("doc_id") * 11) % 1000).cast(StringType), 3, "0"),
            lit("-"),
            lpad(((col("doc_id") * 3) % 100).cast(StringType), 2, "0"),
            lit("-"),
            lpad(((col("doc_id") * 7) % 10000).cast(StringType), 4, "0")))
          .otherwise(lit("")))
      Tables.documents(s, d)
        .withColumn("t", t)
        .select(col("doc_id"),
          regexp_count(col("t"), lit(EmailPat)).cast(LongType).as("n_email"),
          regexp_count(col("t"), lit(PhonePat)).cast(LongType).as("n_phone"),
          regexp_count(col("t"), lit(SsnPat)).cast(LongType).as("n_ssn"),
          regexp_replace(
            regexp_replace(
              regexp_replace(col("t"), EmailPat, "<EMAIL>"),
              PhonePat, "<PHONE>"),
            SsnPat, "<SSN>").as("clean"))
        .orderBy(col("doc_id"))
    }),

    // L24 — sliding-window token chunking: chunk k of a doc covers
    // 1-based token positions [k·40+1, k·40+50]; k ranges over
    // 0..⌊(n−1)/40⌋ so every token is covered and the last chunk may be
    // short. chunk_md5 fingerprints the chunk text for downstream
    // chunk-level dedup.
    "l24_chunking" -> ((s, d) => {
      val start = (col("chunk_id") * ChunkStride + 1).cast(IntegerType)
      Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .withColumn("n", size(col("toks")).cast(LongType))
        .select(col("doc_id"), col("toks"),
          explode(sequence(lit(0L),
            floor(((col("n") - 1).cast(DoubleType)) / ChunkStride)
              .cast(LongType))).as("chunk_id"))
        .select(col("doc_id"), col("chunk_id"),
          size(slice(col("toks"), start, lit(ChunkSize)))
            .cast(LongType).as("n_tok"),
          md5(array_join(slice(col("toks"), start, lit(ChunkSize)), " "))
            .as("chunk_md5"))
        .orderBy(col("doc_id"), col("chunk_id"))
    }),

    // L25 — block-local greedy sequence packing. A doc opens a new bin
    // when it would overflow 256 tokens AND the bin is non-empty (an
    // oversize doc therefore gets a single-doc oversize bin rather than
    // being dropped or split). Emits one row per bin.
    "l25_seq_pack" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).cast(LongType).as("n_tok"))
        .as[(Long, String, Long)]
      docs.groupByKey { case (id, lang, _) => (lang, id / PackBlock) }
        .flatMapGroups { (key: (String, Long), it: Iterator[(Long, String, Long)]) =>
          val (lang, block) = key
          val ds = it.toSeq.sortBy(_._1)
          val out = scala.collection.mutable.ListBuffer
            .empty[(String, Long, Long, Long, Long)]
          var bin = 0L; var acc = 0L; var nd = 0L
          ds.foreach { case (_, _, nt) =>
            if (acc + nt > PackCap && acc > 0) {
              out += ((lang, block, bin, nd, acc))
              bin += 1; acc = 0; nd = 0
            }
            acc += nt; nd += 1
          }
          if (nd > 0) out += ((lang, block, bin, nd, acc))
          out
        }
        .toDF("lang", "block", "bin_id", "n_docs", "n_tokens")
        .orderBy(col("lang"), col("block"), col("bin_id"))
    }),

    // L26 — quality-decile resampling. Global rank over (score, doc_id)
    // computed scale-safely (a8's recipe: range repartition, per-
    // partition counts broadcast back as offsets, per-partition
    // row_number — every stage O(n/p) per task, no single-task window);
    // decile = (rank·10) div n (declared formula deciles, not ntile's
    // remainder rule); keep = md5-bucket < (decile+1)·10.
    "l26_quality_resample" -> ((s, d) => {
      import graft.core.GlobalRank
      import s.implicits._
      val scored = DedupExt.qualityFeatures(s, d)
        .select(col("doc_id"), col("n_toks"), col("score"))
      val n = scored.count()
      GlobalRank.withGlobalIndex(scored,
          Seq(col("score"), col("doc_id"))) { wi =>
        // the 10-row aggregate materializes inside the helper's scope
        // (collect) per its eager-consumption contract
        val rows = wi
          .withColumn("decile", expr(s"(idx * 10) div $n"))
          .withColumn("keep", sampleBucket < (col("decile") + 1) * 10)
          .groupBy(col("decile"))
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
            sum(when(col("keep"), col("n_toks")).otherwise(0L))
              .as("tok_kept"))
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        rows.toSeq.toDF("decile", "n_docs", "n_kept", "tok_kept")
          .orderBy(col("decile"))
      }
    }),

    // L30 — domain mixture weights at temperature τ = 0.5 (the standard
    // source-rebalancing move before pretraining: w_s ∝ n_tokens_s^τ,
    // which upweights small domains relative to proportional sampling).
    // sqrt is IEEE-correctly-rounded (not libm-dependent), its result is
    // pinned to micro fixed-point (floor(z·1e6 + 0.5)), the denominator
    // is an exact integer sum, and the weight is one IEEE division of
    // two exact integers — bit-identical in both engines. 100 TB: one
    // 2-phase groupBy on source; the 20-row total is a broadcast.
    "l30_domain_mix" -> ((s, d) => {
      val per = Tables.documents(s, d)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(split(col("text"), " ")).cast(LongType)).as("n_tokens"))
        .withColumn("sw_micro",
          floor(sqrt(col("n_tokens").cast(DoubleType)) * 1000000.0 + 0.5)
            .cast(LongType))
      val tot = per.agg(sum(col("sw_micro")).as("tot"))
      per.crossJoin(broadcast(tot))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          (col("sw_micro").cast(DoubleType) / col("tot").cast(DoubleType))
            .as("weight"))
        .orderBy(col("source"))
    }),

    // L32 — compression-ratio quality signal: deflate each document once
    // and report (raw bytes, compressed bytes). Highly repetitive or
    // templated text compresses far better than natural prose, making
    // the ratio a cheap language-agnostic quality/boilerplate filter —
    // the information-theoretic cousin of L18's token-ratio heuristics,
    // and a standard stage in production corpus pipelines. DECLARED
    // ORACLE-LESS (the 4th, after a4/a12/l5b): the byte count depends on
    // the JVM's bundled zlib, which DuckDB cannot replay; CurationSpec
    // property-tests it instead (bounds, and self-repetition compressing
    // strictly better). Kernel shape: one Deflater REUSED across the
    // partition via mapPartitions (the L8b batched-kernel pattern —
    // per-row allocation of a native zlib stream is the trap), map-side
    // only, no shuffle before the contract's ORDER BY. 100 TB: pure
    // per-row CPU that partitions perfectly; ~MB/s-per-core deflate
    // throughput is the budget, which is why production pipelines run
    // this once and persist the score.
    "l32_compress_ratio" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d).select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions { it =>
          val defl = new java.util.zip.Deflater(6)
          val buf = new Array[Byte](1 << 16)
          // release the native zlib stream on EVERY task exit path —
          // completion, early termination (limit pushdown), or abort —
          // not just full iterator drain
          Option(org.apache.spark.TaskContext.get())
            .foreach(_.addTaskCompletionListener[Unit](_ => defl.end()))
          it.map { case (id, text) =>
            val in = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            defl.reset(); defl.setInput(in); defl.finish()
            var n = 0L
            while (!defl.finished()) n += defl.deflate(buf)
            (id, in.length.toLong, n)
          }
        }
        .toDF("doc_id", "n_raw", "n_comp")
        .orderBy(col("doc_id"))
    }),

    // L41 — line-level boilerplate stripping (r12): the structural text
    // cleaner of the jusText/trafilatura family that the document-level
    // quality family (L15/L18/L32/L38) cannot express — nav bars,
    // copyright footers and subscribe/tracker lines live INSIDE
    // otherwise-good documents. The synthetic corpus is single-line, so
    // the canonical query first INJECTS deterministic boilerplate lines
    // derived from doc_id arithmetic (the L23/s8b injection pattern —
    // the oracle replays the injection exactly, making the stripper
    // provably fire): a pipe-separated nav header (doc_id % 4), a
    // copyright footer (% 5), a link-bearing subscribe line (% 6).
    // Line classification is the published jusText-style feature rule,
    // in EXACT INTEGER form (no float boundary drift): boilerplate iff
    // a token starts with 'http' (link density), OR '|'-separator
    // tokens are ≥ 1/5 of the line (sep_cnt·5 ≥ n), OR the line is
    // short AND nearly stopword-free (stop_cnt·20 < n AND n < 10; stop
    // list = the L15 corpus top-10, a 10-row broadcast). The whole
    // strip is ONE higher-order-function projection per document —
    // lines never explode into rows, nothing shuffles before the final
    // ORDER BY — so at 100 TB it is a map-side scan like L23.
    "l41_boilerplate" -> ((s, d) => {
      val stops = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token").asc).limit(10)
        .agg(array_sort(collect_list(col("token"))).as("stops"))
      val t = concat(
        when(col("doc_id") % 4 === 0,
          lit(NavLine + "\n")).otherwise(lit("")),
        col("text"),
        when(col("doc_id") % 5 === 0,
          lit("\n" + FooterLine)).otherwise(lit("")),
        when(col("doc_id") % 6 === 0,
          concat(lit("\nclick here to subscribe http://tracker.example.com/?id="),
            col("doc_id").cast(StringType), lit(" unsubscribe")))
          .otherwise(lit("")))
      Tables.documents(s, d)
        .withColumn("t", t)
        .crossJoin(broadcast(stops))
        .withColumn("lines", split(col("t"), "\n"))
        .withColumn("kept", expr(KeptLinesExpr))
        .select(col("doc_id"),
          size(col("lines")).cast(LongType).as("n_lines"),
          (size(col("lines")) - size(col("kept")))
            .cast(LongType).as("n_removed"),
          array_join(col("kept"), "\n").as("clean_text"))
        .orderBy(col("doc_id"))
    }),

    // L35 — deterministic epoch shuffle + shard plan: the reproducible
    // training-order operator every pretraining run needs. A seeded
    // portable hash (md5-prefix integer of doc_id:seed — no RNG, no
    // partition-order dependence) defines the epoch's permutation; the
    // exact global rank under (key, doc_id) comes from the a8/l26
    // GlobalRank recipe (range repartition + broadcast prefix-sum
    // offsets + per-partition row_number — NO single-task window);
    // shard = idx div ceil(n/16), pos = idx mod ceil(n/16). Re-running
    // with the same seed reproduces the byte-identical order on any
    // cluster layout; a new epoch is a new seed, not a reshuffle plan.
    // Output is the 16-row shard summary (driver-bounded): n_docs,
    // first/last pos, Σdoc_id, and Σdoc_id·(pos+1) — the last pins the
    // FULL permutation (any assignment or order change moves it).
    // 100 TB: one range shuffle + map-side aggregate; the collected
    // offsets and the 16-row result are metadata-sized.
    "l35_epoch_shards" -> ((s, d) => {
      import graft.core.GlobalRank
      import s.implicits._
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val n = docs.count()
      val sz = (n + Shards - 1) / Shards
      val keyed = docs.withColumn("key",
        conv(substring(md5(concat(col("doc_id").cast(StringType),
          lit(":" + EpochSeed))), 1, 12), 16, 10).cast(LongType))
      GlobalRank.withGlobalIndex(keyed, Seq(col("key"), col("doc_id"))) { wi =>
        // 16-row aggregate materializes inside the helper's scope
        // (collect) per its eager-consumption contract
        val rows = wi
          .withColumn("shard", expr(s"idx div $sz"))
          .withColumn("pos", col("idx") - col("shard") * sz)
          .groupBy(col("shard"))
          .agg(count(lit(1)).as("n_docs"),
            min(col("pos")).as("first_pos"),
            max(col("pos")).as("last_pos"),
            sum(col("doc_id")).as("sum_doc"),
            sum(col("doc_id") * (col("pos") + lit(1L))).as("sum_doc_pos"))
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4), r.getLong(5)))
        rows.toSeq
          .toDF("shard", "n_docs", "first_pos", "last_pos", "sum_doc",
            "sum_doc_pos")
          .orderBy(col("shard"))
      }
    })
  )

  /** L35 epoch-shard parameters: shard count and the declared epoch
    * seed (a new epoch = a new seed string, same plan). */
  private val Shards = 16L
  private val EpochSeed = "ep1"

  /** L25 window: 256-token bins over ≤1000-doc blocks. */
  private val PackCap = 256L
  private val PackBlock = 1000L

  /** L23 patterns — shared verbatim between the Spark projection and the
    * oracle SQL; restricted to syntax with identical semantics in Java
    * regex and DuckDB's RE2 (no lookaround, no \d/\s class shorthands —
    * see L21's whitespace note). */
  private val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhonePat = "\\+1-[0-9]{3}-[0-9]{3}-[0-9]{4}"
  private val SsnPat = "[0-9]{3}-[0-9]{2}-[0-9]{4}"

  /** L24 window: 50-token chunks every 40 tokens (10-token overlap). */
  private[llm] val ChunkSize = 50
  private[llm] val ChunkStride = 40

  /** L41 injected boilerplate lines (shared with the oracle SQL and
    * CurationSpec's removal pin — one source of truth). */
  private[graft] val NavLine = "home | about | contact | privacy | terms"
  private[graft] val FooterLine =
    "copyright 2024 example corp all rights reserved"

  /** L41 line classifier as one HOF projection over the `lines` array
    * (with the 10-token `stops` array in scope): keep a line unless a
    * token starts with 'http', or separators dominate (sep·5 ≥ n), or
    * it is short and stopword-free (stop·20 < n AND n < 10) — all
    * integer comparisons, no float boundary. */
  private[graft] val KeptLinesExpr: String =
    "filter(lines, ln -> NOT (" +
      "exists(split(ln, ' '), tk -> startswith(tk, 'http')) OR " +
      "size(filter(split(ln, ' '), tk -> tk = '|')) * 5 >= " +
      "size(split(ln, ' ')) OR " +
      "(size(filter(split(ln, ' '), tk -> array_contains(stops, tk))) * 20" +
      " < size(split(ln, ' ')) AND size(split(ln, ' ')) < 10)))"

  private val bucketSql =
    "CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 12) AS BIGINT) % 100"

  private val ratesSql =
    "r(lang, rate) AS (SELECT * FROM (VALUES ('en', 10), ('de', 40), ('es', 40), ('fr', 40), ('zh', 60)) v(lang, rate))"

  /** Shared metric CTE chain (mirrors `repetition` column-for-column). */
  private val repSql =
    """d AS (SELECT doc_id, lang, string_split(text, ' ') AS toks
      |       FROM documents WHERE len(string_split(text, ' ')) > 1),
      |base AS (
      |  SELECT doc_id, lang, len(toks) AS n_tok,
      |         len(list_distinct(toks)) AS n_uniq
      |  FROM d),
      |bg AS (
      |  SELECT doc_id,
      |    unnest(list_transform(generate_series(1, len(toks) - 1),
      |                          i -> toks[i] || '|' || toks[i + 1])) AS bigram
      |  FROM d),
      |top AS (
      |  SELECT doc_id, max(c) AS top_c
      |  FROM (SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY 1, 2)
      |  GROUP BY doc_id),
      |m AS (
      |  SELECT b.doc_id, b.lang, b.n_tok,
      |    1.0 - CAST(b.n_uniq AS DOUBLE) / CAST(b.n_tok AS DOUBLE) AS dup_ratio,
      |    CAST(t.top_c AS DOUBLE) / CAST(b.n_tok - 1 AS DOUBLE) AS top_bigram_frac
      |  FROM base b JOIN top t USING (doc_id)),
      |k AS (
      |  SELECT *, dup_ratio <= 0.55 AND top_bigram_frac <= 0.05 AS keep
      |  FROM m)""".stripMargin

  val oracle: Map[String, String] = Map(
    "l17_stratified_sample" ->
      s"""WITH $ratesSql
        |SELECT d.doc_id, d.lang, d.source, $bucketSql AS bucket
        |FROM documents d JOIN r USING (lang)
        |WHERE $bucketSql < r.rate
        |ORDER BY doc_id""".stripMargin,
    "l18_repetition" ->
      s"""WITH $repSql
        |SELECT doc_id, n_tok, dup_ratio, top_bigram_frac, keep
        |FROM k ORDER BY doc_id""".stripMargin,
    "l19_curation_pipeline" ->
      s"""WITH $repSql,
        |surv AS (
        |  SELECT min(doc_id) AS doc_id
        |  FROM (SELECT doc_id, md5(lower(trim(text))) AS hsh FROM documents)
        |  GROUP BY hsh),
        |$ratesSql
        |SELECT k.lang, count(*) AS n_docs,
        |  CAST(sum(k.n_tok) AS BIGINT) AS n_tokens
        |FROM k
        |JOIN surv USING (doc_id)
        |JOIN r ON r.lang = k.lang
        |WHERE k.keep AND $bucketSql < r.rate
        |GROUP BY k.lang ORDER BY k.lang""".stripMargin,
    // l23 — the injection arithmetic and the three patterns are the SAME
    // Scala constants the Spark query uses (one source of truth); DuckDB
    // regexp_replace needs the explicit 'g' flag where Spark's is global
    // by default.
    "l23_pii_redact" ->
      s"""WITH inj AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 7 = 0 THEN ' contact user' || doc_id ||
        |      '@example.com now' ELSE '' END ||
        |    CASE WHEN doc_id % 11 = 0 THEN ' call +1-415-' ||
        |      lpad(CAST((doc_id*37)%1000 AS VARCHAR), 3, '0') || '-' ||
        |      lpad(CAST((doc_id*73)%10000 AS VARCHAR), 4, '0')
        |      ELSE '' END ||
        |    CASE WHEN doc_id % 13 = 0 THEN ' id ' ||
        |      lpad(CAST((doc_id*11)%1000 AS VARCHAR), 3, '0') || '-' ||
        |      lpad(CAST((doc_id*3)%100 AS VARCHAR), 2, '0') || '-' ||
        |      lpad(CAST((doc_id*7)%10000 AS VARCHAR), 4, '0')
        |      ELSE '' END AS t
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t, '$EmailPat')) AS BIGINT) AS n_email,
        |  CAST(len(regexp_extract_all(t, '$PhonePat')) AS BIGINT) AS n_phone,
        |  CAST(len(regexp_extract_all(t, '$SsnPat')) AS BIGINT) AS n_ssn,
        |  regexp_replace(regexp_replace(regexp_replace(t,
        |    '$EmailPat', '<EMAIL>', 'g'),
        |    '$PhonePat', '<PHONE>', 'g'),
        |    '$SsnPat', '<SSN>', 'g') AS clean
        |FROM inj ORDER BY doc_id""".stripMargin,
    // l24 — DuckDB list slices are 1-based inclusive and clamp at the
    // list end, matching Spark's slice(arr, start, len) exactly.
    "l24_chunking" ->
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents),
        |c AS (
        |  SELECT doc_id, toks, len(toks) AS n,
        |    unnest(generate_series(0,
        |      CAST(floor((len(toks) - 1) / $ChunkStride.0) AS BIGINT)))
        |      AS chunk_id
        |  FROM d)
        |SELECT doc_id, chunk_id,
        |  CAST(len(toks[chunk_id*$ChunkStride+1 :
        |            least(chunk_id*$ChunkStride+$ChunkSize, n)])
        |       AS BIGINT) AS n_tok,
        |  md5(array_to_string(
        |    toks[chunk_id*$ChunkStride+1 :
        |         least(chunk_id*$ChunkStride+$ChunkSize, n)], ' '))
        |    AS chunk_md5
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
    // l25 — linear recursion per (lang, block): row k's bin/fill derive
    // from row k−1's, exactly the greedy scan the Spark flatMapGroups
    // runs; final rows aggregate per bin. (The Spark side's extra acc>0
    // guard only distinguishes the empty-bin case, which here is exactly
    // the recursion's base case — acc = nt > 0 for every recursive row —
    // so the simpler CASE is equivalent, oversize docs included.)
    "l25_seq_pack" ->
      """WITH RECURSIVE d AS (
        |  SELECT doc_id, lang, doc_id // 1000 AS block,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS nt,
        |    row_number() OVER (PARTITION BY lang, doc_id // 1000
        |                       ORDER BY doc_id) AS rn
        |  FROM documents),
        |p(lang, block, rn, bin_id, acc, nt) AS (
        |  SELECT lang, block, rn, CAST(0 AS BIGINT), nt, nt
        |  FROM d WHERE rn = 1
        |  UNION ALL
        |  SELECT d.lang, d.block, d.rn,
        |    CASE WHEN p.acc + d.nt > 256 THEN p.bin_id + 1
        |         ELSE p.bin_id END,
        |    CASE WHEN p.acc + d.nt > 256 THEN d.nt
        |         ELSE p.acc + d.nt END,
        |    d.nt
        |  FROM p JOIN d ON d.lang = p.lang AND d.block = p.block
        |              AND d.rn = p.rn + 1)
        |SELECT lang, block, bin_id,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(nt) AS BIGINT) AS n_tokens
        |FROM p GROUP BY lang, block, bin_id
        |ORDER BY lang, block, bin_id""".stripMargin,
    // l26 — the same q score chain as l15 (shared fragment), ranked with
    // one window (the oracle engine may single-thread it; the Spark side
    // is the distributed two-phase version of the same rank).
    "l26_quality_resample" ->
      s"""WITH ${DedupExt.qualitySql},
        |r AS (
        |  SELECT doc_id, n_toks,
        |    row_number() OVER (ORDER BY score, doc_id) - 1 AS idx,
        |    count(*) OVER () AS n
        |  FROM q),
        |dd AS (
        |  SELECT doc_id, n_toks, (idx * 10) // n AS decile,
        |    $bucketSql AS bucket
        |  FROM r)
        |SELECT decile,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN bucket < (decile + 1) * 10 THEN 1 ELSE 0 END)
        |       AS BIGINT) AS n_kept,
        |  CAST(sum(CASE WHEN bucket < (decile + 1) * 10 THEN n_toks
        |           ELSE 0 END) AS BIGINT) AS tok_kept
        |FROM dd GROUP BY decile ORDER BY decile""".stripMargin,
    "l19b_curation_neardup" ->
      s"""WITH $repSql,
        |surv AS (
        |  SELECT min(doc_id) AS doc_id
        |  FROM (SELECT doc_id, md5(lower(trim(text))) AS hsh FROM documents)
        |  GROUP BY hsh),
        |nsurv AS (
        |  SELECT min(doc_id) AS doc_id
        |  FROM (SELECT doc_id,
        |          sha256(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS sig
        |        FROM documents)
        |  GROUP BY sig),
        |$ratesSql
        |SELECT k.lang, count(*) AS n_docs,
        |  CAST(sum(k.n_tok) AS BIGINT) AS n_tokens
        |FROM k
        |JOIN surv USING (doc_id)
        |JOIN nsurv USING (doc_id)
        |JOIN r ON r.lang = k.lang
        |WHERE k.keep AND $bucketSql < r.rate
        |GROUP BY k.lang ORDER BY k.lang""".stripMargin,
    "l30_domain_mix" ->
      """WITH per AS (
        |  SELECT source, count(*) AS n_docs,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source),
        |w AS (
        |  SELECT source, n_docs, n_tokens,
        |    CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000.0 + 0.5)
        |      AS BIGINT) AS sw
        |  FROM per),
        |t AS (SELECT CAST(sum(sw) AS BIGINT) AS tot FROM w)
        |SELECT source, n_docs, n_tokens,
        |  CAST(sw AS DOUBLE) / CAST(tot AS DOUBLE) AS weight
        |FROM w CROSS JOIN t ORDER BY source""".stripMargin,
    // l41 — injection arithmetic, stop-list derivation and the integer
    // line rule replayed verbatim; the per-line lambda captures the
    // row's `stops` list (the l38-oracle lambda-capture idiom).
    "l41_boilerplate" ->
      s"""WITH tokall AS (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        |stop AS (
        |  SELECT token FROM tokall GROUP BY token
        |  ORDER BY count(*) DESC, token ASC LIMIT 10),
        |st AS (SELECT list_sort(list(token)) AS stops FROM stop),
        |inj AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 4 = 0 THEN '$NavLine' || chr(10)
        |         ELSE '' END ||
        |    text ||
        |    CASE WHEN doc_id % 5 = 0 THEN chr(10) || '$FooterLine'
        |         ELSE '' END ||
        |    CASE WHEN doc_id % 6 = 0 THEN chr(10) ||
        |      'click here to subscribe http://tracker.example.com/?id=' ||
        |      doc_id || ' unsubscribe' ELSE '' END AS t
        |  FROM documents),
        |lw AS (
        |  SELECT doc_id, string_split(t, chr(10)) AS lines, stops
        |  FROM inj CROSS JOIN st),
        |kp AS (
        |  SELECT doc_id, lines,
        |    list_filter(lines, ln -> NOT (
        |      len(list_filter(string_split(ln, ' '),
        |                      tk -> starts_with(tk, 'http'))) > 0 OR
        |      len(list_filter(string_split(ln, ' '), tk -> tk = '|')) * 5
        |        >= len(string_split(ln, ' ')) OR
        |      (len(list_filter(string_split(ln, ' '),
        |                       tk -> list_contains(stops, tk))) * 20
        |         < len(string_split(ln, ' '))
        |       AND len(string_split(ln, ' ')) < 10))) AS kept
        |  FROM lw)
        |SELECT doc_id,
        |  CAST(len(lines) AS BIGINT) AS n_lines,
        |  CAST(len(lines) - len(kept) AS BIGINT) AS n_removed,
        |  array_to_string(kept, chr(10)) AS clean_text
        |FROM kp ORDER BY doc_id""".stripMargin,
    "l35_epoch_shards" ->
      """WITH k AS (
        |  SELECT doc_id,
        |    CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':ep1'),
        |      1, 12) AS BIGINT) AS key
        |  FROM documents),
        |r AS (
        |  SELECT doc_id,
        |    row_number() OVER (ORDER BY key, doc_id) - 1 AS idx
        |  FROM k),
        |p AS (SELECT CAST(ceil(count(*) / 16.0) AS BIGINT) AS sz
        |      FROM documents)
        |SELECT idx // sz AS shard, count(*) AS n_docs,
        |  min(idx - (idx // sz) * sz) AS first_pos,
        |  max(idx - (idx // sz) * sz) AS last_pos,
        |  CAST(sum(doc_id) AS BIGINT) AS sum_doc,
        |  CAST(sum(doc_id * (idx - (idx // sz) * sz + 1)) AS BIGINT)
        |    AS sum_doc_pos
        |FROM r CROSS JOIN p
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
