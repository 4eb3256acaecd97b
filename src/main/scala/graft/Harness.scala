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
    * GraftFunctions.ensure inside the queries that need them.) */
  def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // Raw (checksum-free) local FS for FileContext users — i.e. the
      // structured-streaming checkpoint file manager (offset/commit WAL,
      // state store delta/changelog commits). Hadoop's default local Fs
      // writes a .crc twin beside every file; on a per-run tmpfs
      // checkpoint that doubles the many small synchronous writes every
      // micro-batch pays, for integrity a single-process local run
      // cannot use. Measured: offset+commit+wal log time halves
      // (StreamDiag agg: ~35 ms → ~18 ms per write). Batch parquet I/O
      // is untouched (FileSystem API, fs.file.impl key). A production
      // deployment points checkpoints at HDFS/S3, whose AbstractFileSystem
      // carries its own integrity story — this key only rebinds file:.
      .config("spark.hadoop.fs.AbstractFileSystem.file.impl",
              "org.apache.hadoop.fs.local.RawLocalFs")
      .getOrCreate()
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
