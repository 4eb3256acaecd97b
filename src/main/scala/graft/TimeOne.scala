package graft

/** Dev utility: time canonical queries under the shared Harness
  * protocol (1 warm-up + 3 timed noop-sink runs, prints the p50 each)
  * without paying for the whole sweep. Names may be exact or a prefix
  * ending in `*` (`s5*` times the three interval joins).
  * `runMain graft.TimeOne <name> [name...] [sfDir]`. */
object TimeOne {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: TimeOne <queryName>... [sfDir]")
    val (names, sfDir) =
      if (args.last.contains("/")) (args.init.toSeq, args.last)
      else (args.toSeq, "/root/testdata/sf0.1")
    val picked = names.flatMap { n =>
      if (n.endsWith("*"))
        SparkEntry.queries.keys.filter(_.startsWith(n.init)).toSeq.sorted
      else {
        require(SparkEntry.queries.contains(n), s"unknown query '$n'")
        Seq(n)
      }
    }.distinct
    require(picked.nonEmpty,
      s"no query matches ${names.mkString(", ")} (sfDir=$sfDir) — " +
      "an sfDir-only invocation times nothing")
    val spark = Harness.session(checksumFreeFs = true)
    var total = 0.0
    picked.foreach { name =>
      val timed = Harness.timed3(SparkEntry.queries(name)(spark, sfDir))
      total += timed(1)
      println(f"[timeone] $name p50=${timed(1)}%.3f all=${timed.map(t => f"$t%.3f").mkString(",")}")
    }
    if (picked.size > 1) println(f"[timeone] TOTAL p50 sum=${total}%.3f over ${picked.size} queries")
    spark.stop()
  }
}
