package graft


/** ANN quality/latency sweep (SURVEY §2.10 L3 scale path, quantified).
  *
  * For each nprobe in 1..10 runs the parameterized IVF search
  * (`Llm.ivfTopK`) on `SPARK_GRAFT_SF_DIR`, measuring
  *  - recall@5 against the exact brute-force baseline (`l3_cosine_topk`),
  *  - p50 latency of 3 timed runs after 1 warm-up (same protocol as
  *    Bench).
  * Prints one JSON line; the measured table lives in BASELINE.md ("IVF
  * ANN quality/latency"). nprobe=10 probes every coarse cell, so its
  * recall is 1.0 by construction — a built-in sanity check on the
  * measurement itself.
  */
object AnnBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Harness.session(checksumFreeFs = true)

    def topSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet

    val exact = topSet(SparkEntry.queries("l3_cosine_topk")(spark, sfDir))
    // scoring = "full" (micro-long payload, l3c) vs "int8" (quantized
    // codes, l3d) — same candidates, different scoring bandwidth
    val rows = for (scoring <- Seq("full", "int8"); rassign <- 1 to 2;
                    nprobe <- 1 to 10) yield {
      def run() =
        if (scoring == "int8")
          graft.llm.Llm.ivfInt8TopK(spark, sfDir, nprobe, rassign = rassign)
        else graft.llm.Llm.ivfTopK(spark, sfDir, nprobe, rassign = rassign)
      val p50 = Harness.timed3(run())(1)
      val recall = (exact & topSet(run())).size.toDouble / exact.size
      f"""{"scoring":"$scoring","rassign":$rassign,"nprobe":$nprobe,"recall_at_5":$recall%.3f,"p50_sec":$p50%.3f}"""
    }
    // the two compressed-scan designs at their canonical settings:
    // l3e's whole-corpus ADC scan, and l3f's IVF-PQ (probed-cell ADC) —
    // one latency-recall point each, comparable to the sweep rows above
    val fixed = Seq(
      "pq_adc" -> (() => graft.llm.Llm.pqTopK(spark, sfDir)),
      "ivf_pq" -> (() => graft.llm.Llm.ivfPqTopK(spark, sfDir))
    ).map { case (name, run) =>
      val p50 = Harness.timed3(run())(1)
      val recall = (exact & topSet(run())).size.toDouble / exact.size
      f"""{"scoring":"$name","recall_at_5":$recall%.3f,"p50_sec":$p50%.3f}"""
    }
    println(s"""{"metric":"ann_sweep","sf":"$sfDir","baseline":"l3_cosine_topk","sweep":[${(rows ++ fixed).mkString(",")}]}""")
    spark.stop()
  }
}
