package graft
import org.apache.spark.sql.SparkSession

/** Dev utility: time ONE canonical query (same protocol as Bench — 1
  * warm-up + 3 timed noop-sink runs, prints the p50) without paying for
  * the whole 94-query sweep. `runMain graft.TimeOne <name> [sfDir]`. */
object TimeOne {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: TimeOne <queryName> [sfDir]")
    val name = args(0)
    val sfDir =
      if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def once(): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    once()
    val timed = Seq(once(), once(), once()).sorted
    println(f"[timeone] $name p50=${timed(1)}%.3f all=${timed.map(t => f"$t%.3f").mkString(",")}")
    spark.stop()
  }
}
