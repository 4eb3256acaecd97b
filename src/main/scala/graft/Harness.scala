package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared session + measurement protocol for the driver-contract mains
  * (Verify, Bench, TimeOne, AnnBench). One definition of the correctly-
  * configured local session and of BASELINE.md's timing rule (1 warm-up
  * + 3 timed noop-sink runs, report the p50) — so a protocol change
  * (e.g. a new required session conf like the nanosAsLong fix) cannot
  * drift between the tools that all claim to measure the same way. */
object Harness {
  /** The driver-contract local session: local[$SPARK_GRAFT_CPUS],
    * matching shuffle parallelism, UTC, nanos-tolerant parquet reads,
    * no UI. (Native functions self-register on first use via
    * GraftFunctions.ensure inside the queries that need them.)
    *
    * `checksumFreeFs` (TIMING sessions only — Bench/TimeOne/AnnBench):
    * rebinds file:'s AbstractFileSystem to RawLocalFs so FileContext
    * users — i.e. the structured-streaming checkpoint file manager
    * (offset/commit WAL, state delta/changelog commits) — skip the .crc
    * twin Hadoop's default local Fs writes beside every file. On a
    * per-run tmpfs checkpoint that halves the many small synchronous
    * writes every micro-batch pays (StreamDiag agg: ~35 ms → ~18 ms per
    * write). The trade is losing checksum DETECTION of on-disk
    * checkpoint corruption, so correctness-gate runs (Verify, tests)
    * keep the default checksummed FS — a timing capture is re-runnable,
    * a silently-corrupt correctness verdict is not. Batch parquet I/O
    * is untouched either way (FileSystem API, fs.file.impl key); a
    * production deployment points checkpoints at HDFS/S3, whose
    * AbstractFileSystem carries its own integrity story. */
  def session(checksumFreeFs: Boolean = false): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    if (checksumFreeFs)
      b.config("spark.hadoop.fs.AbstractFileSystem.file.impl",
               "org.apache.hadoop.fs.local.RawLocalFs")
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** One timed noop-sink run: the full plan executes (including sorts a
    * bare count() would let Catalyst drop), no sink I/O is paid. */
  def timeOnce(df: => DataFrame): Double = {
    val t0 = System.nanoTime()
    df.write.mode("overwrite").format("noop").save()
    (System.nanoTime() - t0) / 1e9
  }

  /** BASELINE.md protocol: 1 warm-up + 3 timed runs, sorted ascending
    * (index 1 is the reported p50). */
  def timed3(df: => DataFrame): Seq[Double] = {
    timeOnce(df)
    Seq(timeOnce(df), timeOnce(df), timeOnce(df)).sorted
  }
}
