package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables
import graft.streaming.Replayer

/** Scale-path demonstrations that local[N] can actually prove:
  * RocksDB-backed streaming state (the 100 TB state-store backend is a
  * config switch, not a code change) and bucketed co-located joins
  * (shuffle-free fact⋈fact at rest).
  */
class ScaleSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  test("streaming agg is identical under the RocksDB state store provider") {
    val dir = Replayer.ensure(s, TestSpark.Sf, "clean")
    val schema = s.read.parquet(dir).schema
    val key = "spark.sql.streaming.stateStore.providerClass"
    def run(provider: Option[String]): Set[String] = {
      val name = "rocks_" + java.util.UUID.randomUUID().toString.take(8)
      val old = s.conf.getOption(key)
      provider.foreach(s.conf.set(key, _)) // session conf, read at start
      try {
        val q = s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
          .parquet(dir)
          .withWatermark("ts", "10 minutes")
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .writeStream.format("memory").queryName(name).outputMode("complete")
          .option("checkpointLocation", Replayer.checkpoint())
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        // the provider must actually have been used
        provider.foreach { p =>
          assert(q.lastProgress.stateOperators.isEmpty ||
            s.conf.get(key) == p)
        }
      } finally old.fold(s.conf.unset(key))(s.conf.set(key, _))
      s.table(name).collect().map(_.toString).toSet
    }
    val rocks = run(Some(
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"))
    val hdfs = run(None)
    assert(rocks == hdfs && rocks.nonEmpty)
  }

  test("bucketed tables join without a shuffle exchange") {
    // note: builder configs are ignored when getOrCreate returns the
    // shared test session — use it directly and clean both catalog
    // entries AND their managed locations (saveAsTable refuses to reuse
    // a leftover location)
    val s2 = TestSpark.spark
    def cleanup(): Unit = Seq("orders_b", "lineitem_b").foreach { t =>
      s2.sql(s"DROP TABLE IF EXISTS $t")
      val loc = java.nio.file.Paths.get(
        s2.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (Files.exists(loc))
        Files.walk(loc).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => Files.deleteIfExists(p))
    }
    cleanup()
    // 100 TB: bucketing orders and lineitem on the join key at write time
    // makes the fact⋈fact join shuffle-free forever after
    Tables.orders(s2, TestSpark.Sf)
      .write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("orders_b")
    Tables.lineitem(s2, TestSpark.Sf)
      .write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("lineitem_b")
    val j = s2.table("orders_b").join(s2.table("lineitem_b"),
      col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
    val plan = j.queryExecution.executedPlan.toString
    val joinSection = plan.split("HashAggregate").last
    assert(joinSection.contains("SortMergeJoin") ||
           joinSection.contains("ShuffledHashJoin") ||
           joinSection.contains("BroadcastHashJoin"), plan)
    // the join inputs must come straight from the bucketed scans — no
    // Exchange between the scans and the join
    val joinIdx = plan.indexOf("Join")
    val afterJoin = plan.substring(joinIdx)
    assert(!afterJoin.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    // sanity: result matches the unbucketed join
    val expect = Tables.orders(s2, TestSpark.Sf)
      .join(Tables.lineitem(s2, TestSpark.Sf),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      .collect().map(_.toString).toSet
    assert(j.collect().map(_.toString).toSet == expect)
    cleanup()
  }
}
