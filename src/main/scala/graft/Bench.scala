package graft

/** Benchmark main (driver contract). Protocol per BASELINE.md: for each
  * query, 1 warm-up + 3 timed runs, report the median (p50).
  *
  * The timed action is a `noop`-format write: it fully executes the plan
  * (including sorts and projections that a bare `.count()` would let
  * Catalyst eliminate) without paying sink I/O. Per-query failures are
  * reported in the JSON (`errors` map) instead of being swallowed.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Harness.session()

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
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    // Compact per-query timings (ms precision keeps the line short enough
    // that no log-buffer truncation can eat the tail) — and the same JSON
    // is ALSO written to BENCH.json so the driver can read it whole even
    // if stdout capture clips.
    // Locale.ROOT: the default-locale formatter would emit comma
    // decimals (invalid JSON) on e.g. de_DE JVMs
    def ms(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v) => s"${q(k)}:${ms(v)}" }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => s"${q(k)}:${q(v)}" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val line = s"""{"metric":"total","value":${ms(total)},"unit":"sec","queries":$qs,"errors":$errJson,"n_failed":${errors.size},"sf":"$sfDir"}"""
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH.json"), line)
    catch { case e: Throwable => System.err.println(s"[bench] BENCH.json write failed: $e") }
    println(line)
    spark.stop()
  }
}
