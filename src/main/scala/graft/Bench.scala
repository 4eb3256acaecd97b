package graft

/** Benchmark main (driver contract). Protocol per BASELINE.md: for each
  * query, 1 warm-up + 3 timed runs, report the median (p50).
  *
  * The timed action is a `noop`-format write: it fully executes the plan
  * (including sorts and projections that a bare `.count()` would let
  * Catalyst eliminate) without paying sink I/O. Per-query failures are
  * reported in the JSON (`errors` map) instead of being swallowed.
  *
  * Contention canary: machine-state CPU contention has mispriced
  * individual captures by up to 8.8× (r6 driver capture: l21 4.99 s vs
  * 0.52–0.68 s across eight committed captures at the same commit). A
  * FIXED-WORK data-independent calibration job runs before and after
  * the sweep; its times ship in the JSON (`canary`) so any capture can
  * be priced against the committed history of the same fixed work —
  * nominal on this box is 0.20–0.35 s (BASELINE.md). A canary far above
  * nominal marks the whole capture as contended, not a regression.
  *
  * Output protocol: the FULL JSON (all per-query timings) is written to
  * BENCH.json and printed first; a SHORT self-contained summary line is
  * printed LAST because the driver's stdout tail buffer has truncated
  * the head of the full line before (r6: first ~36 queries clipped →
  * `parsed: null`) — the tail always ends with complete, parseable JSON
  * carrying the totals, the canary, and the slowest queries.
  */
object Bench {
  import org.apache.spark.sql.{DataFrame, SparkSession}
  import org.apache.spark.sql.functions._

  /** Fixed-work calibration job: 16M xxhash64 rows over 32 even range
    * partitions — pure CPU + scheduler, no input data, no shuffle. The
    * same work every capture on every machine, so its time is a direct
    * read of available CPU at capture time. Folded with bit_xor, not
    * sum: 16M uniform 64-bit hashes overflow a long sum under ANSI. */
  private def canaryOnce(s: SparkSession): Double =
    Harness.timeOnce(
      s.range(0L, 16L * 1024 * 1024, 1L, 32)
        .select(bit_xor(xxhash64(col("id"))).as("h")))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Harness.session()

    canaryOnce(spark) // warm-up (JIT + range codegen)
    val canaryStart = canaryOnce(spark)

    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val timed = Harness.timed3(fn(spark, sfDir))
        Some(name -> timed(1)) // p50 of 3
      } catch {
        case e: Throwable =>
          errors(name) = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}"
          System.err.println(s"[bench] $name FAILED: ${errors(name)}")
          None
      }
    }
    val canaryEnd = canaryOnce(spark)
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    // Locale.ROOT: the default-locale formatter would emit comma
    // decimals (invalid JSON) on e.g. de_DE JVMs
    def ms(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v) => s"${q(k)}:${ms(v)}" }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => s"${q(k)}:${q(v)}" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // end/start ratio: >1 means the machine degraded DURING the capture;
    // either value far above the committed nominal means it was
    // contended THROUGHOUT (the r6 failure mode).
    val canary = s"""{"start_sec":${ms(canaryStart)},"end_sec":${ms(canaryEnd)},"ratio":${ms(canaryEnd / math.max(canaryStart, 1e-9))}}"""
    val line = s"""{"metric":"total","value":${ms(total)},"unit":"sec","queries":$qs,"errors":$errJson,"n_failed":${errors.size},"canary":$canary,"sf":"$sfDir"}"""
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH.json"), line)
    catch { case e: Throwable => System.err.println(s"[bench] BENCH.json write failed: $e") }
    println(line)
    // Short summary LAST — survives any head-truncating tail capture.
    val slowest = results.sortBy(-_._2).take(10)
      .map { case (k, v) => s"${q(k)}:${ms(v)}" }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${ms(total)},"unit":"sec","n_queries":${results.size},"n_failed":${errors.size},"canary":$canary,"slowest":$slowest,"queries_detail":"BENCH.json","sf":"$sfDir"}""")
    spark.stop()
  }
}
