package graft

/** Dev utility (guide §1: measure first): run streaming queries once
  * warm + once instrumented and print each micro-batch's
  * StreamingQueryProgress duration breakdown (addBatch, queryPlanning,
  * walCommit, stateStore commit counts) — the evidence base for
  * overhead-vs-data-bound adjudication of the replay family.
  * `runMain graft.StreamProf <name> [name...] [sfDir]`. */
object StreamProf {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: StreamProf <queryName>... [sfDir]")
    val (names, sfDir) =
      if (args.last.contains("/")) (args.init.toSeq, args.last)
      else (args.toSeq, "/root/testdata/sf0.1")
    val spark = Harness.session(checksumFreeFs = true)
    // per-job trace: (jobId, submit ns, completion ns, description)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val jobLog = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, String)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.put(e.jobId, (System.nanoTime(),
            Option(e.properties.getProperty("spark.job.description"))
              .orElse(Option(e.properties.getProperty("callSite.short")))
              .getOrElse("?")))
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val st = jobs.remove(e.jobId)
          if (st != null)
            jobLog.add((e.jobId, System.nanoTime() - st._1, st._2))
        }
      })
    val progs = new java.util.concurrent.ConcurrentLinkedQueue[
      org.apache.spark.sql.streaming.StreamingQueryProgress]()
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryProgress(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit =
          progs.add(e.progress)
        override def onQueryTerminated(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      })
    names.foreach { n =>
      require(SparkEntry.queries.contains(n), s"unknown query '$n'")
      // warm-up (fixtures, JIT, code paths)
      SparkEntry.queries(n)(spark, sfDir).count()
      progs.clear(); jobLog.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).count()
      val t1 = System.nanoTime()
      println(f"[prof] $n total=${(t1 - t0) / 1e9}%.3f s")
      import scala.jdk.CollectionConverters._
      var sums = Map.empty[String, Long].withDefaultValue(0L)
      progs.asScala.toSeq.sortBy(_.batchId).foreach { p =>
        val dm = p.durationMs.asScala.toMap
        dm.foreach { case (k, v) => sums += k -> (sums(k) + v) }
        println(s"[prof]   batch=${p.batchId} rows=${p.numInputRows} " +
          dm.toSeq.sortBy(-_._2).map { case (k, v) => s"$k=$v" }.mkString(" "))
        p.stateOperators.foreach { so =>
          println(s"[prof]     op=${so.operatorName} commitMs=${so.allUpdatesTimeMs}+${so.commitTimeMs} " +
            s"rowsUpd=${so.numRowsUpdated} shufflePartsStores=${so.customMetrics}")
        }
      }
      println("[prof]   SUM " + sums.toSeq.sortBy(-_._2)
        .map { case (k, v) => s"$k=$v" }.mkString(" "))
      val jl = jobLog.asScala.toSeq.sortBy(_._1)
      println(f"[prof]   JOBS n=${jl.size} totalMs=${jl.map(_._2).sum / 1e6}%.0f")
      jl.foreach { case (id, ns, desc) =>
        println(f"[prof]     job=$id%-4d ms=${ns / 1e6}%7.1f  ${desc.take(90)}")
      }
    }
    spark.stop()
  }
}
