package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SURVEY §1.3's promised source abstraction: every unbounded input the
  * engine consumes is a `StreamSource` that materializes a streaming
  * DataFrame on demand, so query logic never names a concrete connector.
  *
  * The file-replay source stands in for Kafka in this zero-egress env
  * (same contract: replayable offsets tracked in the checkpoint, so
  * exactly-once holds across restarts — the SNK2 test). A real Kafka
  * connector becomes one more implementation (`format("kafka")` +
  * subscribe options + a value-deserialization select) with zero changes
  * to the queries consuming it.
  */
trait StreamSource {
  /** Open the unbounded input as a streaming DataFrame. */
  def stream(s: SparkSession): DataFrame
}

/** SRC4 — file-source replay of the `events` table: one file per
  * micro-batch in deterministic (mtime-pinned) order; `variant` selects
  * the clean / late / dup / funnel fixture (see [[Replayer]]). */
final case class FileReplaySource(sfDir: String, variant: String = "clean")
    extends StreamSource {
  def stream(s: SparkSession): DataFrame = Replayer.stream(s, sfDir, variant)
}

/** SRC5 — the built-in synthetic rate source: `rowsPerSecond` rows of
  * (timestamp, value), value a gap-free sequence. Load generator for
  * smoke tests and throughput calibration; never oracle-checked (its
  * content is wall-clock-dependent by construction). */
final case class RateSource(rowsPerSecond: Int) extends StreamSource {
  def stream(s: SparkSession): DataFrame =
    s.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString).load()
}

/** Adapter for an externally constructed streaming DataFrame (e.g. a
  * MemoryStream's `toDF` in tests) so it can flow through the same
  * source-agnostic query functions. */
final case class WrappedSource(df: DataFrame) extends StreamSource {
  def stream(s: SparkSession): DataFrame = df
}
