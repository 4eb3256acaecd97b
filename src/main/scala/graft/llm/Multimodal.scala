package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Multimodal-column processing plumbing (SURVEY §2.10 L8 extension).
  *
  * Real pipelines carry image/audio/video as opaque `binary` columns with
  * typed metadata and run decode / feature-extraction as *batched*
  * per-partition kernels (the JVM analogue of `mapInPandas`: one library
  * call per batch, not per row). The decode KERNEL here is a STUB — the
  * container has no image/audio codecs — replaced by a deterministic
  * arithmetic fake (clearly marked below). Everything around it is the
  * real contract and is exercised for real: envelope schema
  * (`struct<mime, bytes:binary, meta:map>`), partition-batched iteration,
  * typed output schema, and the oracle check on the output.
  *
  * 100 TB notes: mapPartitions keeps the decode amortized per batch and
  * pipelined with the scan; binary payloads never shuffle (derive
  * features first, shuffle the small feature rows).
  */
object Multimodal {

  /** STUB decode kernel — stands in for an image decoder. Deterministic
    * arithmetic on the payload so the driver's DuckDB oracle can verify
    * the plumbing end-to-end. A real deployment swaps ONLY this function
    * (signature: one batch of payloads in, one batch of features out). */
  private def decodeBatch(batch: Iterator[(Long, Array[Byte])])
      : Iterator[(Long, Long, Long, Long)] =
    batch.map { case (id, bytes) =>
      val len = bytes.length.toLong
      (id, len % 1024, (len * 7) % 768, len % 16 + 1)
    }

  /** STUB resize + frame-sample kernel: "resizes" the payload by striding
    * (every 4th byte — a real kernel interpolates pixels; the Spark-side
    * contract is byte-in/byte-out with a deterministic size change) and
    * "samples frames" by hashing a strided window per frame index. */
  private def resizeBatch(batch: Iterator[(Long, Array[Byte])])
      : Iterator[(Long, Long, String, Long)] =
    batch.map { case (id, bytes) =>
      val resized = Array.range(0, bytes.length, 4).map(bytes(_))
      val digest = java.security.MessageDigest.getInstance("SHA-256")
        .digest(resized).map("%02x".format(_)).mkString
      val nFrames = bytes.length % 16 + 1
      (id, resized.length.toLong, digest, nFrames.toLong)
    }

  /** STUB per-frame feature-extract kernel — the ONE-TO-MANY batched
    * shape (a frame sampler emitting a feature row per sampled frame —
    * the UDTF analogue of the decode kernel). Frame k's "feature" is the
    * count and sum of payload bytes at positions ≡ k (mod n_frames);
    * frames whose stride has no samples (payload shorter than the frame
    * count) emit nothing, in both engines. */
  private def frameFeatBatch(batch: Iterator[(Long, Array[Byte])])
      : Iterator[(Long, Long, Long, Long)] =
    batch.flatMap { case (id, bytes) =>
      val n = bytes.length
      val nFrames = n % 16 + 1
      (0 until math.min(nFrames, n)).map { k =>
        var sum = 0L; var cnt = 0L; var i = k
        while (i < n) { sum += (bytes(i) & 0xff); cnt += 1; i += nFrames }
        (id, k.toLong, cnt, sum)
      }
    }

  /** L8e blockhash kernel: a 64-bit perceptual-style hash over the raw
    * payload, packed as 4×16-bit bands. Block i (i = position mod 64)
    * contributes bit i; the bit is set iff the block's mean byte value
    * is ≥ the payload's global mean, compared in EXACT integer
    * cross-multiplied form (sum_i · n ≥ total · n_i — no division, no
    * float boundary) so the DuckDB oracle replays it bit-for-bit.
    * Empty blocks (payload shorter than 64 bytes) read 0 ≥ 0 → bit
    * set, deterministically in both engines. Intermediates bounded by
    * 255·n² < 2^63 for any payload under ~190 MB. */
  private def blockhashBatch(batch: Iterator[(Long, Array[Byte])])
      : Iterator[(Long, Long, Long, Long, Long)] =
    batch.map { case (id, bytes) =>
      val n = bytes.length.toLong
      val sums = new Array[Long](64)
      val cnts = new Array[Long](64)
      var total = 0L
      var i = 0
      while (i < bytes.length) {
        val b = (bytes(i) & 0xff).toLong
        sums(i % 64) += b; cnts(i % 64) += 1; total += b; i += 1
      }
      val h = new Array[Long](4)
      var k = 0
      while (k < 64) {
        if (sums(k) * n >= total * cnts(k)) h(k / 16) |= 1L << (k % 16)
        k += 1
      }
      (id, h(0), h(1), h(2), h(3))
    }

  /** Shared L8e/L8f front end: the image corpus (base + derived variants)
    * hashed by the batched blockhash kernel. Checkpointed because every
    * consumer reads it at least twice (band explode + verify sides, or
    * group + assign sides). */
  private def imgsHashed(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
    val base = docs
      .select(col("doc_id").as("img_id"),
        encode(col("text"), "UTF-8").as("bytes"))
      .unionByName(docs.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + VariantIdOffset).as("img_id"),
          encode(concat(lit("z"), substring(col("text"), 2, 1 << 30)),
            "UTF-8").as("bytes")))
    base.as[(Long, Array[Byte])]
      .mapPartitions(blockhashBatch)
      .toDF("img_id", "h0", "h1", "h2", "h3")
      .localCheckpoint()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // L8b — batched decode over binary envelopes (stub kernel, real
    // plumbing: encode → binary column → mapPartitions batch → typed
    // feature schema).
    "l8b_decode" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("bytes"))
        .as[(Long, Array[Byte])]
        .mapPartitions(decodeBatch)
        .toDF("doc_id", "width", "height", "n_frames")
        .orderBy(col("doc_id"))
    }),

    // L8c — resize / frame-sample plumbing (stub kernel; the byte-level
    // stride is reproducible in the oracle so the batch path is verified
    // end-to-end including the binary transform itself).
    "l8c_resize" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("bytes"))
        .as[(Long, Array[Byte])]
        .mapPartitions(resizeBatch)
        .toDF("doc_id", "resized_len", "resized_sha", "n_frames")
        .orderBy(col("doc_id"))
    }),

    // L8d — per-frame feature extraction (stub kernel, real one-to-many
    // batched plumbing: one input row fans out to n_frames feature rows
    // inside the partition batch, so payload bytes still never shuffle —
    // only the small per-frame feature rows do).
    "l8d_framefeat" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("bytes"))
        .as[(Long, Array[Byte])]
        .mapPartitions(frameFeatBatch)
        .toDF("doc_id", "frame", "n_px", "px_sum")
        .orderBy(col("doc_id"), col("frame"))
    }),

    // L8e — image near-dup via blockhash + banded hamming join (r12):
    // the standard image-dedup pass of multimodal pipelines (pHash /
    // blockhash over decoded pixels, hamming-radius pairing). The
    // "image" is the L8b payload envelope; near-duplicates provably
    // exist via a derived VARIANT image per doc_id % 5 == 0 (first
    // byte overwritten — a tiny perturbation, id offset +1,000,000,
    // replayed by the oracle). The 64-bit hash is computed in the
    // batched kernel (payload bytes never shuffle — only the hash rows
    // do), then pairs at hamming ≤ 3 come from an exact-match join on
    // any of the 4 16-bit bands: by pigeonhole, ≤ 3 differing bits can
    // spoil at most 3 of 4 bands, so band-blocking has GUARANTEED 100%
    // recall at this radius — the LSH economy without the approximation.
    // Plan shape (r14): both full hashes ride ALONG the band rows, so
    // the hamming verify runs map-side on the band join's output —
    // candidates never shuffle; only the verified ≤-radius pairs reach
    // the final distinct (the r12 shape shuffled the raw candidate set
    // twice through distinct + two hash re-joins).
    // 100 TB: the pair LISTING itself is the scale ceiling — once the
    // corpus exceeds the hash's effective entropy (measured here:
    // 600k images collapse onto 49k distinct 64-bit hashes, so
    // hamming-0 pairs alone are 13.6M ∝ n²), the radius-≤3 relation is
    // quadratic in size and no candidate scheme can beat its own
    // output. Production consumes near-dup as the L8f representative
    // collapse below (linear output) and widens the hash for precision,
    // not as an exhaustive pair dump; SCALE_r14.json carries both rows.
    "l8e_image_neardup" -> ((s, d) => {
      val imgs = imgsHashed(s, d)
      val bands = imgs.select(col("img_id"),
        col("h0"), col("h1"), col("h2"), col("h3"),
        posexplode(array(col("h0"), col("h1"), col("h2"), col("h3")))
          .as(Seq("band", "bv")))
      bands.as("a")
        .join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
            col("a.img_id") < col("b.img_id"))
        .select(col("a.img_id").as("va"), col("b.img_id").as("vb"),
          expr("cast(bit_count(a.h0 ^ b.h0) + bit_count(a.h1 ^ b.h1) + " +
               "bit_count(a.h2 ^ b.h2) + bit_count(a.h3 ^ b.h3) " +
               "as bigint)").as("hamming"))
        .filter(col("hamming") <= HammingRadius)
        .distinct()
        .orderBy(col("va"), col("vb"))
    }),

    // L8f — image dedup collapse (r14): the PRODUCTION consumption of
    // L8e's near-dup signal. A 100 TB pipeline never materializes the
    // pairwise relation (quadratic once the corpus saturates the hash's
    // entropy — see L8e); it assigns every image to a cluster
    // representative and filters the corpus through that map. Exact
    // semantics: cluster = identical full 64-bit blockhash (radius-0,
    // deterministic, no approximation), representative = min img_id.
    // Output is one row per image — linear — built from ONE groupBy
    // (map-side partial min, skew-immune) + one equi-join back on the
    // hash key (AQE splits any hot hash). The skew-safe two-phase shape
    // (G3's rule: never a window over a hub-sized partition).
    "l8f_image_dedup" -> ((s, d) => {
      val imgs = imgsHashed(s, d)
      val hk = Seq("h0", "h1", "h2", "h3")
      val keepers = imgs.groupBy(hk.map(col): _*)
        .agg(min(col("img_id")).as("keeper"))
      imgs.join(keepers, hk)
        .select(col("img_id"), col("keeper"),
          (col("img_id") === col("keeper")).cast("long").as("kept"))
        .orderBy(col("img_id"))
    })
  )

  /** L8e dials: variant ids live VariantIdOffset above their source doc
    * (disjoint from any doc_id at every shipped sf), pairing radius 3
    * (the 4-band pigeonhole bound: radius ≤ bands − 1 keeps band
    * blocking exact). */
  private val VariantIdOffset = 1000000L
  private val HammingRadius = 3L

  val oracle: Map[String, String] = Map(
    // Mirrors the stub kernel's arithmetic on the UTF-8 byte length.
    "l8b_decode" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) % 1024 AS BIGINT) AS width,
        |  CAST((octet_length(encode(text)) * 7) % 768 AS BIGINT) AS height,
        |  CAST(octet_length(encode(text)) % 16 + 1 AS BIGINT) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,
    // the corpus is pure ASCII, so character stride == byte stride and
    // sha256(string) hashes the same bytes the kernel hashed
    "l8c_resize" ->
      """WITH u AS (
        |  SELECT doc_id, text,
        |    unnest(generate_series(1, length(text), 4)) AS i
        |  FROM documents),
        |r AS (
        |  SELECT doc_id,
        |    string_agg(substring(text, i, 1), '' ORDER BY i) AS rs
        |  FROM u GROUP BY doc_id)
        |SELECT r.doc_id,
        |  CAST(length(r.rs) AS BIGINT) AS resized_len,
        |  sha256(r.rs) AS resized_sha,
        |  CAST(octet_length(encode(d.text)) % 16 + 1 AS BIGINT) AS n_frames
        |FROM r JOIN documents d ON d.doc_id = r.doc_id
        |ORDER BY r.doc_id""".stripMargin,
    // ASCII corpus: ord(char) == payload byte, so the strided byte sums
    // are reproducible from the text; frames with an empty stride have
    // an empty generate_series and vanish, matching the kernel's
    // min(n_frames, n) bound.
    "l8d_framefeat" ->
      """WITH d AS (
        |  SELECT doc_id, text, octet_length(encode(text)) AS n,
        |    octet_length(encode(text)) % 16 + 1 AS nf
        |  FROM documents),
        |k AS (
        |  SELECT doc_id, text, n, nf,
        |    unnest(generate_series(0, nf - 1)) AS frame
        |  FROM d),
        |pos AS (
        |  SELECT doc_id, frame, text,
        |    unnest(generate_series(frame + 1, n, nf)) AS i
        |  FROM k)
        |SELECT doc_id, frame,
        |  CAST(count(*) AS BIGINT) AS n_px,
        |  CAST(sum(ord(substring(text, i, 1))) AS BIGINT) AS px_sum
        |FROM pos GROUP BY doc_id, frame
        |ORDER BY doc_id, frame""".stripMargin,
    // l8e — ASCII corpus: ord(char) == payload byte, so the strided
    // block sums replay from the text; the all-64-block scaffold makes
    // empty blocks (payload < 64 bytes) read 0 ≥ 0 → bit set, exactly
    // the kernel's rule. Band join + xor/bit_count verify mirror the
    // engine's plan shape one-to-one.
    "l8e_image_neardup" ->
      s"""WITH b8e AS (
        |  SELECT doc_id AS img_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + $VariantIdOffset, 'z' || substring(text, 2)
        |  FROM documents WHERE doc_id % 5 = 0),
        |pos8e AS (
        |  SELECT img_id, i, ord(substring(text, i, 1)) AS byte
        |  FROM b8e, unnest(generate_series(1, length(text))) AS g(i)),
        |blk8e AS (
        |  SELECT img_id, (i - 1) % 64 AS blk, sum(byte) AS s,
        |         count(*) AS c
        |  FROM pos8e GROUP BY img_id, (i - 1) % 64),
        |tot8e AS (
        |  SELECT b.img_id, coalesce(sum(p.byte), 0) AS total,
        |         length(b.text) AS n
        |  FROM b8e b LEFT JOIN pos8e p USING (img_id)
        |  GROUP BY b.img_id, length(b.text)),
        |allb AS (
        |  SELECT t.img_id, g.blk, coalesce(b.s, 0) AS s,
        |         coalesce(b.c, 0) AS c, t.total, t.n
        |  FROM tot8e t
        |  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS blk) g
        |  LEFT JOIN blk8e b ON b.img_id = t.img_id AND b.blk = g.blk),
        |hv AS (
        |  SELECT img_id, blk // 16 AS band,
        |    CAST(sum(CASE WHEN s * n >= total * c
        |             THEN 1 << (blk % 16) ELSE 0 END) AS BIGINT) AS bv
        |  FROM allb GROUP BY img_id, blk // 16),
        |h4 AS (
        |  SELECT img_id,
        |    max(CASE WHEN band = 0 THEN bv END) AS h0,
        |    max(CASE WHEN band = 1 THEN bv END) AS h1,
        |    max(CASE WHEN band = 2 THEN bv END) AS h2,
        |    max(CASE WHEN band = 3 THEN bv END) AS h3
        |  FROM hv GROUP BY img_id),
        |cand AS (
        |  SELECT DISTINCT a.img_id AS va, b.img_id AS vb
        |  FROM hv a JOIN hv b
        |    ON a.band = b.band AND a.bv = b.bv AND a.img_id < b.img_id),
        |hm AS (
        |  SELECT va, vb,
        |    CAST(bit_count(xor(x.h0, y.h0)) + bit_count(xor(x.h1, y.h1)) +
        |         bit_count(xor(x.h2, y.h2)) + bit_count(xor(x.h3, y.h3))
        |         AS BIGINT) AS hamming
        |  FROM cand JOIN h4 x ON va = x.img_id JOIN h4 y ON vb = y.img_id)
        |SELECT va, vb, hamming FROM hm WHERE hamming <= $HammingRadius
        |ORDER BY va, vb""".stripMargin,
    // l8f — same blockhash replay as l8e, then the radius-0 collapse:
    // representative = min img_id per identical full hash (a window min
    // is fine at oracle scale; the engine uses the skew-safe two-phase
    // form).
    "l8f_image_dedup" ->
      s"""WITH b8e AS (
        |  SELECT doc_id AS img_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + $VariantIdOffset, 'z' || substring(text, 2)
        |  FROM documents WHERE doc_id % 5 = 0),
        |pos8e AS (
        |  SELECT img_id, i, ord(substring(text, i, 1)) AS byte
        |  FROM b8e, unnest(generate_series(1, length(text))) AS g(i)),
        |blk8e AS (
        |  SELECT img_id, (i - 1) % 64 AS blk, sum(byte) AS s,
        |         count(*) AS c
        |  FROM pos8e GROUP BY img_id, (i - 1) % 64),
        |tot8e AS (
        |  SELECT b.img_id, coalesce(sum(p.byte), 0) AS total,
        |         length(b.text) AS n
        |  FROM b8e b LEFT JOIN pos8e p USING (img_id)
        |  GROUP BY b.img_id, length(b.text)),
        |allb AS (
        |  SELECT t.img_id, g.blk, coalesce(b.s, 0) AS s,
        |         coalesce(b.c, 0) AS c, t.total, t.n
        |  FROM tot8e t
        |  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS blk) g
        |  LEFT JOIN blk8e b ON b.img_id = t.img_id AND b.blk = g.blk),
        |hv AS (
        |  SELECT img_id, blk // 16 AS band,
        |    CAST(sum(CASE WHEN s * n >= total * c
        |             THEN 1 << (blk % 16) ELSE 0 END) AS BIGINT) AS bv
        |  FROM allb GROUP BY img_id, blk // 16),
        |h4 AS (
        |  SELECT img_id,
        |    max(CASE WHEN band = 0 THEN bv END) AS h0,
        |    max(CASE WHEN band = 1 THEN bv END) AS h1,
        |    max(CASE WHEN band = 2 THEN bv END) AS h2,
        |    max(CASE WHEN band = 3 THEN bv END) AS h3
        |  FROM hv GROUP BY img_id)
        |SELECT img_id,
        |  min(img_id) OVER (PARTITION BY h0, h1, h2, h3) AS keeper,
        |  CAST(img_id = min(img_id) OVER (PARTITION BY h0, h1, h2, h3)
        |       AS BIGINT) AS kept
        |FROM h4 ORDER BY img_id""".stripMargin
  )
}
