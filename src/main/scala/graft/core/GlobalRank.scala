package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Exact 0-based global row index over a sort order WITHOUT a single-task
  * window — the scale-safe rank recipe shared by a8 (exact percentiles)
  * and l26 (quality deciles): range-repartition on the sort key,
  * collect per-partition counts (≤ #partitions longs — metadata, not
  * data), broadcast the prefix-sum offsets back, and add a per-partition
  * row_number. Every stage is O(n/p) per task at any scale; the offsets
  * ride a broadcast hash join, NOT a folded when-chain, which would be a
  * #partitions-deep expression tree that breaks codegen at cluster
  * partition counts (10k+). */
object GlobalRank {

  /** Run `body` over `df` extended with a 0-based `idx` column giving the
    * exact global rank under ascending `sortCols`. `body` MUST consume
    * its input eagerly (collect/count) and return something independent
    * of it: the range partitioning behind the index is sampling-based,
    * so a lazy consumer recomputing it after the cache is released could
    * see partition boundaries inconsistent with the collected offsets. */
  def withGlobalIndex[A](df: DataFrame, sortCols: Seq[Column])
      (body: DataFrame => A): A = {
    val s = df.sparkSession
    import s.implicits._
    val nPart = s.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val ranged = df.repartitionByRange(nPart, sortCols: _*)
      .withColumn("pid", spark_partition_id())
    ranged.cache()
    try {
      val offsets = ranged.groupBy("pid").count().collect()
        .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
        .scanLeft((-1, 0L, 0L)) { case ((_, off, c0), (pid, c)) =>
          (pid, off + c0, c) }
        .drop(1).map { case (pid, off, _) => (pid, off) }
      val offDf = broadcast(offsets.toSeq.toDF("pid", "off"))
      val w = Window.partitionBy(col("pid")).orderBy(sortCols: _*)
      body(ranged.join(offDf, "pid")
        .withColumn("idx",
          row_number().over(w).cast(LongType) - 1 + col("off"))
        .drop("pid", "off"))
    } finally ranged.unpersist()
  }
}
