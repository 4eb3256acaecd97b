package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.Replayer
import graft.core.ConfScope

/** Dev diagnostic (test scope, not shipped): replays one S-shaped query
  * and prints Spark's own per-micro-batch durationMs breakdown
  * (triggerExecution / queryPlanning / walCommit / addBatch / ...), so
  * S-block overhead work targets the phase that actually costs time
  * instead of a guess. Usage:
  *   sbt "Test/runMain graft.StreamDiag [shape] [k=v ...]"
  * shapes: agg (S1-like), join (S5-like), funnel-free dedup (S6-like).
  * k=v pairs become session confs for the run.
  */
object StreamDiag {
  /** Accumulates scheduler-level truth: how many jobs/stages/tasks a run
    * launched and how much of the wall was actual task compute. */
  private class StageTally extends org.apache.spark.scheduler.SparkListener {
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    val deserMs = new java.util.concurrent.atomic.AtomicLong
    val gcMs = new java.util.concurrent.atomic.AtomicLong
    override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
      jobs.incrementAndGet()
    val stageLines = new java.util.concurrent.ConcurrentLinkedQueue[String]
    override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      stages.incrementAndGet()
      val i = e.stageInfo
      val dur = for (a <- i.submissionTime; b <- i.completionTime) yield b - a
      stageLines.add(s"stage ${i.stageId} [${i.name.takeWhile(_ != '\n').take(60)}] " +
        s"tasks=${i.numTasks} wallMs=${dur.getOrElse(-1L)}")
    }
    override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      tasks.incrementAndGet()
      val m = e.taskMetrics
      if (m != null) {
        taskMs.addAndGet(m.executorRunTime)
        deserMs.addAndGet(m.executorDeserializeTime)
        gcMs.addAndGet(m.jvmGCTime)
      }
    }
    def report(): String =
      s"jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get} " +
        s"taskRunMs=${taskMs.get} deserMs=${deserMs.get} gcMs=${gcMs.get}"
    def reset(): Unit = { jobs.set(0); stages.set(0); tasks.set(0)
      taskMs.set(0); deserMs.set(0); gcMs.set(0) }
  }

  def main(args: Array[String]): Unit = {
    val shape = args.headOption.getOrElse("agg")
    val confs = args.drop(1).filter(_.contains("="))
      .map { a => val Array(k, v) = a.split("=", 2); k -> v }.toMap
    val s = Harness.session(checksumFreeFs = true)
    // args like hadoop.fs.AbstractFileSystem.file.impl=... go to the
    // (context-wide) hadoopConfiguration, not the session conf
    confs.filter(_._1.startsWith("hadoop.")).foreach { case (k, v) =>
      s.sparkContext.hadoopConfiguration.set(k.stripPrefix("hadoop."), v) }
    val tally = new StageTally
    s.sparkContext.addSparkListener(tally)
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def once(): Unit = {
      val df = shape match {
        case "agg" =>
          Replayer.stream(s, d, "clean")
            .withWatermark("ts", Replayer.WatermarkDelay)
            .groupBy(window(col("ts"), "1 hour"), col("event_type"))
            .agg(count(lit(1)).as("n"))
        case "join" =>
          val l = Replayer.stream(s, d, "clean")
            .select(col("event_id"), col("user_id"), col("ts").as("lts"))
            .withWatermark("lts", Replayer.WatermarkDelay)
          val r = Replayer.stream(s, d, "clean")
            .select(col("event_id").as("rid"), col("user_id").as("ruid"),
                    col("ts").as("rts"))
            .withWatermark("rts", Replayer.WatermarkDelay)
          l.join(r, l("user_id") === r("ruid") &&
            col("rts").between(col("lts"), col("lts") + expr("interval 5 minutes")))
        case "dedup" =>
          Replayer.stream(s, d, "dup")
            .withWatermark("ts", Replayer.WatermarkDelay)
            .dropDuplicates("event_id")
            .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      }
      val name = "diag_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val ckpt = Replayer.checkpoint()
      val t0 = System.nanoTime()
      try {
        ConfScope.withConf(s, Map(
          "spark.sql.shuffle.partitions" -> "2",
          "spark.sql.streaming.noDataMicroBatches.enabled" -> "false") ++
          confs.filterNot(_._1.startsWith("hadoop."))) {
          val q = df.writeStream.format("memory").queryName(name)
            .outputMode(if (shape == "join") "append" else "complete")
            .option("checkpointLocation", ckpt)
            .trigger(Trigger.AvailableNow()).start()
          q.awaitTermination()
          val wall = (System.nanoTime() - t0) / 1e6
          val prog = q.recentProgress
          println(f"== $shape wall=${wall}%.0f ms, ${prog.length} batches, confs=$confs")
          val keys = prog.flatMap(_.durationMs.keySet.toArray.asInstanceOf[Array[AnyRef]].map(_.toString)).distinct.sorted
          for (p <- prog) {
            val ds = keys.map(k => f"$k=${Option(p.durationMs.get(k)).fold(-1L)(_.longValue)}")
            println(s"  batch ${p.batchId}: " + ds.mkString(" "))
          }
          val sums = keys.map(k => k ->
            prog.map(p => Option(p.durationMs.get(k)).fold(0L)(_.longValue)).sum)
          println("  SUM: " + sums.map { case (k, v) => s"$k=$v" }.mkString(" "))
          println("  SCHED: " + tally.report())
          tally.stageLines.forEach(l => println("    " + l))
          tally.stageLines.clear()
          tally.reset()
        }
      } finally Replayer.dropCheckpoint(ckpt)
      s.catalog.dropTempView(name)
    }
    once() // warm
    once()
    once()
  }
}
