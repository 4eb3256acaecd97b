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
    })
  )

  val oracle: Map[String, String] = Map(
    // Mirrors the stub kernel's arithmetic on the UTF-8 byte length.
    "l8b_decode" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) % 1024 AS BIGINT) AS width,
        |  CAST((octet_length(encode(text)) * 7) % 768 AS BIGINT) AS height,
        |  CAST(octet_length(encode(text)) % 16 + 1 AS BIGINT) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
