package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** SURVEY.md §2.6 sort/limit (O1–O2) + §2.7 set operations (U1–U3).
  *
  * 100 TB notes: O1 is a range-partitioned total sort (Spark samples key
  * ranges, sorts each partition locally — no single-task sort); O2 lowers
  * to TakeOrderedAndProject (per-partition top-k, then a k-row merge on
  * the driver — k=100 longs, not data). Set ops U1–U3 are hash
  * aggregations/joins on the key, all 2-phase.
  */
object SortsSetOps {

  /** Customer vs (negative-balance) supplier nation keys — the filtered
    * supplier side keeps U2/U3 non-degenerate (every nation has *some*
    * supplier, so the unfiltered EXCEPT would be empty by construction). */
  private def custNk(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(col("c_nationkey").as("nk"))
  private def suppNegNk(s: SparkSession, d: String): DataFrame =
    Tables.supplier(s, d).filter(col("s_acctbal") < 0)
      .select(col("s_nationkey").as("nk"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // O1 — multi-key total sort with explicit null ordering + limit.
    "o1_sort" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"),
                col("l_quantity"))
        .orderBy(col("l_shipdate").desc_nulls_last, col("l_orderkey").asc,
                 col("l_linenumber").asc)
        .limit(1000)),

    // O2 — global top-k (TakeOrderedAndProject).
    "o2_topk" -> ((s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)),

    // U1 — union all + multiplicity (distinct covered by U2/U3 semantics).
    "u1_union" -> ((s, d) =>
      custNk(s, d).unionByName(suppNegNk(s, d))
        .groupBy(col("nk")).agg(count(lit(1)).as("n"))
        .orderBy(col("nk"))),

    // U2 — intersect (distinct): nations with customers AND a
    // negative-balance supplier.
    "u2_intersect" -> ((s, d) =>
      custNk(s, d).intersect(suppNegNk(s, d)).orderBy(col("nk"))),

    // U3 — except (distinct): nations with customers but NO
    // negative-balance supplier.
    "u3_except" -> ((s, d) =>
      custNk(s, d).except(suppNegNk(s, d)).orderBy(col("nk"))),

    // U5 — INTERSECT ALL (multiset): each nation key survives with
    // multiplicity min(m_customer, m_supplier⁻). The grouped count in the
    // output is what distinguishes it from U2 — bag semantics are only
    // visible in multiplicities. 100 TB: Spark plans intersectAll as a
    // count-compare aggregate + generate, 2-phase, no row explosion
    // beyond the surviving multiset.
    "u5_intersect_all" -> ((s, d) =>
      custNk(s, d).intersectAll(suppNegNk(s, d))
        .groupBy(col("nk")).agg(count(lit(1)).as("n"))
        .orderBy(col("nk"))),

    // U6 — EXCEPT ALL (multiset): multiplicity m_customer − m_supplier⁻,
    // floored at zero.
    "u6_except_all" -> ((s, d) =>
      custNk(s, d).exceptAll(suppNegNk(s, d))
        .groupBy(col("nk")).agg(count(lit(1)).as("n"))
        .orderBy(col("nk"))),

    // U4 — unpivot/melt (wide→long), the inverse of A11's pivot: part
    // numeric attributes melted into (metric, val) rows via the typed
    // Dataset.unpivot API (Spark 3.4+; same lowering as SQL UNPIVOT).
    // 100 TB: pure map-side row expansion, no shuffle beyond the
    // contract's final sort.
    "u4_unpivot" -> ((s, d) =>
      Tables.part(s, d)
        .select(col("p_partkey"),
          col("p_size").cast(org.apache.spark.sql.types.DoubleType)
            .as("size"),
          col("p_retailprice").as("price"))
        .unpivot(Array(col("p_partkey")),
                 Array(col("size"), col("price")), "metric", "val")
        .orderBy(col("p_partkey"), col("metric")))
  )

  val oracle: Map[String, String] = Map(
    "o1_sort" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity
        |FROM lineitem
        |ORDER BY l_shipdate DESC NULLS LAST, l_orderkey ASC, l_linenumber ASC
        |LIMIT 1000""".stripMargin,
    "o2_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin,
    "u1_union" ->
      """SELECT nk, count(*) AS n FROM (
        |  SELECT c_nationkey AS nk FROM customer
        |  UNION ALL
        |  SELECT s_nationkey AS nk FROM supplier WHERE s_acctbal < 0)
        |GROUP BY nk ORDER BY nk""".stripMargin,
    "u2_intersect" ->
      """SELECT c_nationkey AS nk FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nk FROM supplier WHERE s_acctbal < 0
        |ORDER BY nk""".stripMargin,
    "u3_except" ->
      """SELECT c_nationkey AS nk FROM customer
        |EXCEPT
        |SELECT s_nationkey AS nk FROM supplier WHERE s_acctbal < 0
        |ORDER BY nk""".stripMargin,
    "u5_intersect_all" ->
      """SELECT nk, count(*) AS n FROM (
        |  SELECT c_nationkey AS nk FROM customer
        |  INTERSECT ALL
        |  SELECT s_nationkey AS nk FROM supplier WHERE s_acctbal < 0)
        |GROUP BY nk ORDER BY nk""".stripMargin,
    "u6_except_all" ->
      """SELECT nk, count(*) AS n FROM (
        |  SELECT c_nationkey AS nk FROM customer
        |  EXCEPT ALL
        |  SELECT s_nationkey AS nk FROM supplier WHERE s_acctbal < 0)
        |GROUP BY nk ORDER BY nk""".stripMargin,
    "u4_unpivot" ->
      """SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS val
        |FROM part
        |UNION ALL
        |SELECT p_partkey, 'price', p_retailprice FROM part
        |ORDER BY p_partkey, metric""".stripMargin
  )
}
