package graft

/** Dev utility (guide §1: capture `.explain("formatted")` evidence):
  * writes each named query's formatted physical plan to
  * `plans/r21/<name>_<tag>.txt`. Queries whose canonical entry runs a
  * streaming pipeline or driver loop EXECUTE while being planned — the
  * plan captured is the final DataFrame the bench times (for iterative
  * queries that is the loop output over checkpointed inputs; the loop
  * structure itself is described in OPTIMIZATION_r21.md).
  * `runMain graft.PlanDump <tag> <name> [name...] [sfDir]`. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <tag> <queryName>... [sfDir]")
    val tag = args.head
    val rest = args.tail
    val (names, sfDir) =
      if (rest.last.contains("/")) (rest.init.toSeq, rest.last)
      else (rest.toSeq, "/root/testdata/sf0.1")
    val spark = Harness.session(checksumFreeFs = true)
    val outDir = java.nio.file.Paths.get("plans", "r21")
    java.nio.file.Files.createDirectories(outDir)
    names.foreach { n =>
      require(SparkEntry.queries.contains(n), s"unknown query '$n'")
      val df = SparkEntry.queries(n)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(outDir.resolve(s"${n}_$tag.txt"), txt)
      println(s"[plandump] wrote plans/r21/${n}_$tag.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
