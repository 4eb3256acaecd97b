package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._
import graft.llm.{Bpe, Cluster, Curation, DedupExt, Llm, Multimodal, Retrieval}
import graft.streaming.Streams

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query IDs follow SURVEY.md §2 (the declared operator inventory).
  * Every entry in `queries` that is SQL-expressible has a matching
  * DuckDB oracle in `oracleSql`; sketch/stateful operators without an
  * oracle are property-tested in src/test instead.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Aggregates.queries("a1_pricing")(spark, "/root/testdata/sf0.001")

  private val blocks: Seq[(Map[String, (SparkSession, String) => DataFrame],
                           Map[String, String])] = Seq(
    (Projections.queries, Projections.oracle),
    (Aggregates.queries, Aggregates.oracle),
    (Joins.queries, Joins.oracle),
    (Windows.queries, Windows.oracle),
    (SortsSetOps.queries, SortsSetOps.oracle),
    (Functions.queries, Functions.oracle),
    (SourcesSinks.queries, SourcesSinks.oracle),
    (Graph.queries, Graph.oracle),
    (Llm.queries, Llm.oracle),
    (DedupExt.queries, DedupExt.oracle),
    (Curation.queries, Curation.oracle),
    (Cluster.queries, Cluster.oracle),
    (Bpe.queries, Bpe.oracle),
    (Retrieval.queries, Retrieval.oracle),
    (Multimodal.queries, Multimodal.oracle),
    (Streams.queries, Streams.oracle)
  )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    blocks.iterator.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    blocks.iterator.map(_._2).reduce(_ ++ _)
}
