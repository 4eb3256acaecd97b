package graft

/** Dev utility: time ONE canonical query under the shared Harness
  * protocol (1 warm-up + 3 timed noop-sink runs, prints the p50)
  * without paying for the whole 94-query sweep.
  * `runMain graft.TimeOne <name> [sfDir]`. */
object TimeOne {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: TimeOne <queryName> [sfDir]")
    val name = args(0)
    val sfDir =
      if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'"))
    val spark = Harness.session()
    val timed = Harness.timed3(fn(spark, sfDir))
    println(f"[timeone] $name p50=${timed(1)}%.3f all=${timed.map(t => f"$t%.3f").mkString(",")}")
    spark.stop()
  }
}
