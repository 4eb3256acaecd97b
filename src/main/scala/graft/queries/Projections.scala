package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Canon, Tables}

/** SURVEY.md §2.1 scans + §2.2 projection/filter (SRC1, P1–P3).
  * Each entry pairs a DataFrame-API query with DuckDB oracle SQL; both
  * follow the Canon protocol so hashes match bit-for-bit.
  */
object Projections {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // SRC1 — vectorized parquet batch scan. 100 TB: scan-only + global agg
    // is 2-phase (partial per file-split, final single reduce).
    "src1_scan" -> ((s, d) =>
      Tables.lineitem(s, d).agg(
        count(lit(1)).as("n_rows"),
        sum($(("l_orderkey"))).as("sum_okey"))),

    // P1 — projection + computed column. Net price via exact decimals.
    // 100 TB: pure map-side, no shuffle except the final sort (which the
    // contract requires for determinism only).
    "p1_project" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(
          $("l_orderkey"), $("l_linenumber"),
          Canon.d(Canon.money($("l_extendedprice")) *
            (lit(1).cast(Canon.Money) - Canon.money($("l_discount"))))
            .as("net"))
        .orderBy($("l_orderkey"), $("l_linenumber"))),

    // P2 — predicate filter (IN / BETWEEN / LIKE). Plan check: all three
    // predicates reach the parquet scan as PushedFilters.
    "p2_filter" -> ((s, d) =>
      Tables.orders(s, d)
        .filter($("o_orderstatus").isin("O", "F") &&
          $("o_totalprice").between(1000, 5000) &&
          $("o_orderpriority").like("1-%"))
        .orderBy($("o_orderkey"))),

    // P3 — conditional expressions (CASE bucketing + nullif): 'P'-status
    // orders are nulled out by nullif and surface as a NULL group.
    "p3_case" -> ((s, d) =>
      Tables.orders(s, d)
        .withColumn("band",
          when($("o_totalprice") < 50000, "low")
            .when($("o_totalprice") < 150000, "mid")
            .otherwise("high"))
        .withColumn("status_np", nullif($("o_orderstatus"), lit("P")))
        .groupBy($("band"), $("status_np")).agg(count(lit(1)).as("n"))
        .orderBy($("band"), $("status_np").asc_nulls_first))
  )

  val oracle: Map[String, String] = Map(
    "src1_scan" ->
      "SELECT count(*) AS n_rows, CAST(sum(l_orderkey) AS BIGINT) AS sum_okey FROM lineitem",
    "p1_project" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |       (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS net
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "p2_filter" ->
      """SELECT * FROM orders
        |WHERE o_orderstatus IN ('O','F') AND o_totalprice BETWEEN 1000 AND 5000
        |  AND o_orderpriority LIKE '1-%'
        |ORDER BY o_orderkey""".stripMargin,
    "p3_case" ->
      """SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
        |            WHEN o_totalprice < 150000 THEN 'mid'
        |            ELSE 'high' END AS band,
        |  nullif(o_orderstatus, 'P') AS status_np, count(*) AS n
        |FROM orders GROUP BY 1, 2
        |ORDER BY band, status_np NULLS FIRST""".stripMargin
  )

  /** Shorthand: column by name without needing spark.implicits in scope. */
  private def $(name: String) = col(name)
}
