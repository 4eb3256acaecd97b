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
    })
  )

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
        |ORDER BY doc_id, frame""".stripMargin
  )
}
