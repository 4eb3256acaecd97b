package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables

/** SURVEY.md §2 — G1: iterative graph analytics (PageRank).
  *
  * The Pregel-shaped iterative workload class (PageRank / label
  * propagation / SimRank) that an analytics engine needs beyond the
  * one-shot connected components of L22: a fixed number of
  * message-passing rounds, each one shuffle-join on the edge source +
  * one aggregation on the destination.
  *
  * Graph: the co-purchase bipartite graph — an undirected edge between
  * customer c and supplier s iff some order of c has a lineitem from s
  * (distinct pairs; node id = custkey·2 for customers, suppkey·2+1 for
  * suppliers, so one BIGINT key space covers both sides). Every node in
  * the edge relation has degree ≥ 1 and the symmetric edge list has no
  * dangling nodes, so no dangling-mass correction is needed.
  *
  * Arithmetic (the repo's exact-integer contract): fixed-point BIGINT
  * mass at Scale = 1e12. pr0 = Scale div nv; each round
  *
  *   pr'(v) = (15·Scale) div (100·nv)
  *          + (85 · Σ_{u∼v} (pr(u) div deg(u))) div 100
  *
  * — floor division throughout, so five rounds are bit-replayable in
  * any engine (no IEEE ops at all). Mass peaks ≤ Scale, so
  * 85·Σ ≤ 8.5e13: int64-safe at any corpus size (per-round mass is
  * normalized, not corpus-cumulative).
  *
  * 100 TB shape: the edge build is one distinct over the orders ⋈
  * lineitem join (both keyed o_orderkey — one shuffle); each round is
  * the Pregel step (shuffle on src, aggregate on dst) with the rank
  * relation localCheckpoint'd per round to truncate lineage — round
  * count is fixed (5), so total work is 5 linear passes over |E|.
  * Top-20 is TakeOrderedAndProject (per-partition heads, 20-row merge).
  */
object Graph {

  /** Fixed-point mass scale (1e12: nv up to ~1e9 nodes still leaves
    * ≥1e3 resolution steps per node's teleport share). */
  val Scale = 1000000000000L

  /** PageRank rounds — fixed, part of the canonical definition. */
  val Rounds = 5

  /** The symmetric co-purchase edge list: (src, dst) both directions,
    * customer nid = 2·custkey, supplier nid = 2·suppkey + 1. */
  private def edges(s: SparkSession, d: String): DataFrame = {
    val pairs = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("c"),
        (col("l_suppkey") * 2 + 1).as("p"))
      .distinct()
    pairs.select(col("c").as("src"), col("p").as("dst"))
      .unionByName(pairs.select(col("p").as("src"), col("c").as("dst")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "g1_pagerank" -> ((s, d) => {
      val e = edges(s, d).localCheckpoint()
      val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .localCheckpoint()
      val nv = deg.count()
      val tele = (15L * Scale) / (100L * nv)
      var pr = deg.select(col("src").as("nid"),
        lit(Scale / nv).as("pr"))
      for (_ <- 1 to Rounds) {
        pr = e.join(pr, e("src") === pr("nid"))
          .join(deg, "src")
          .select(col("dst"), expr("pr div deg").as("m"))
          .groupBy(col("dst")).agg(sum(col("m")).as("sumin"))
          .select(col("dst").as("nid"),
            (lit(tele) + expr("(85 * sumin) div 100")).as("pr"))
          .localCheckpoint()
      }
      pr.select(col("nid"),
          when(col("nid") % 2 === 0, lit("customer"))
            .otherwise(lit("supplier")).as("kind"),
          expr("nid div 2").as("key"), col("pr"))
        .orderBy(col("pr").desc, col("nid").asc)
        .limit(20)
    })
  )

  val oracle: Map[String, String] = {
    // Generated oracle (the l3c idiom): the five rounds unrolled as
    // chained CTEs, each replaying the integer Pregel step verbatim.
    val rounds = (1 to Rounds).map { i =>
      s"""pr$i AS (
         |  SELECT e.dst AS nid,
         |    CAST((15 * ${Scale} // (100 * s.nv))
         |      + (85 * sum(p.pr // g.deg)) // 100 AS BIGINT) AS pr
         |  FROM eg1 e
         |  JOIN pr${i - 1} p ON e.src = p.nid
         |  JOIN dg1 g ON e.src = g.src
         |  CROSS JOIN nvg1 s
         |  GROUP BY e.dst, s.nv)""".stripMargin
    }.mkString(",\n")
    Map(
      "g1_pagerank" ->
        s"""WITH pg1 AS (
           |  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS p
           |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
           |eg1 AS (
           |  SELECT c AS src, p AS dst FROM pg1
           |  UNION ALL SELECT p AS src, c AS dst FROM pg1),
           |dg1 AS (
           |  SELECT src, CAST(count(*) AS BIGINT) AS deg
           |  FROM eg1 GROUP BY src),
           |nvg1 AS (SELECT CAST(count(*) AS BIGINT) AS nv FROM dg1),
           |pr0 AS (
           |  SELECT src AS nid, ${Scale} // s.nv AS pr
           |  FROM dg1 CROSS JOIN nvg1 s),
           |$rounds
           |SELECT nid,
           |  CASE WHEN nid % 2 = 0 THEN 'customer' ELSE 'supplier' END
           |    AS kind,
           |  nid // 2 AS key, pr
           |FROM pr${Rounds}
           |ORDER BY pr DESC, nid ASC LIMIT 20""".stripMargin
    )
  }
}
