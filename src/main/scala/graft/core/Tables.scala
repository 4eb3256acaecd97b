package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loaders for the driver-generated TPC-H-ish testdata
  * (see /root/repo/TESTDATA.md, FIXTURES.md). Reference capability surface
  * per SURVEY.md §2 (the reference repo is a 1-line stub:
  * /root/reference/README.md:1 — the declared inventory is the contract).
  *
  * 100 TB notes: each table is a plain parquet scan — Spark's vectorized
  * reader + Catalyst pushdown (filters/column pruning reach the scan) mean
  * these loaders are the right primitive at any scale; partition discovery
  * and predicate pushdown happen per-file, so a 100 TB lineitem directory
  * behaves identically to the single test file.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = t(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = t(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** Register all tables as temp views so spark.sql(...) queries (engine
    * entry point E1, SURVEY §3) can reference them by name. */
  def registerAll(s: SparkSession, d: String): Unit =
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings")
      .foreach(n => t(s, d, n).createOrReplaceTempView(n))
}
