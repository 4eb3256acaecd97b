package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** E1 parity sweep (SURVEY §3): representative canonical queries run as
  * SQL TEXT through Engine.sql — the exact oracle SQL each query is
  * graded against — must produce identical results to the DataFrame
  * forms. A user coming from a SQL-first engine writes this text
  * directly; this spec pins that the SQL entry point and the DataFrame
  * library are the same engine, not two.
  *
  * Queries whose oracle uses DuckDB-only builtins (sha256, unnest in
  * SELECT, list_*, string_split…) are excluded here — their SQL parity
  * is covered by the driver's DuckDB gate instead; this sweep covers
  * every ANSI-portable oracle (51 as of r8: joins, aggregates, windows,
  * set ops, sorts, projections, the full source/sink round-trip family,
  * and every stream query whose batch-face oracle parses in both
  * engines). The r8 list is the exhaustive result of probing ALL
  * oracleSql entries through Engine.sql — additions to the exclusion
  * comment below must name the diverging construct.
  */
class SqlSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  private val parity = Seq(
    "src1_scan", "src2_csv_roundtrip", "src3_json_roundtrip",
    "src4_stream_scan", "src7_orc_roundtrip", "src8_xml_roundtrip",
    "snk3_partitioned_roundtrip", "snk4_upsert", "snk5_fanout",
    "j1_inner", "j2_broadcast", "j3_outer", "j4_semi", "j5_anti",
    "j6_theta", "j7_range", "j8_asof",
    "j11_scalar_subquery", "j12_recursive", "j13_lateral",
    "a1_pricing", "a2_global", "a3_distinct", "a8_percentile",
    "a10_wavg", "a13_filtered_agg",
    "o1_sort", "o2_topk",
    "u1_union", "u2_intersect", "u3_except", "u4_unpivot",
    "u5_intersect_all", "u6_except_all",
    "w1_rank", "w2_topn", "w5_firstlast",
    "p1_project", "p2_filter", "p3_case",
    "f5_map", "l7_lang_stats",
    "s1_tumbling", "s3_session", "s3b_session_dynamic",
    "s4_stream_static", "s5_interval_join", "s6_dedup", "s7_late",
    "s10_window_topn", "s11_chained",
    // r13/r14 additions whose oracles are ANSI-portable (probed
    // through Engine.sql): the two-phase weighted median, the bucketed
    // and SCD2 joins, the semi interval join's EXISTS face, the W9b
    // chained-window-maxima DP, and both sink round-trip checksums
    "a15_weighted_median", "j15_bucketed", "j16_scd2",
    "s17_semi_interval", "w9b_skip_pattern",
    "snk6_compaction", "snk7_sorted_skip", "snk8_zorder_skip",
    "src9_schema_evolution", "s18_scd2_stream", "snk9_snapshot_publish",
    "j17_dpp", "j8b_asof_forward", "s19_stream_snapshot")
  // Known dialect-divergent oracles, excluded by declaration (their SQL
  // parity is covered by the driver's DuckDB gate instead): the f-family
  // and l-series lean on DuckDB list/string builtins; a5/a11
  // (list()/PIVOT syntax), a6* (DuckDB's 2-arg grouping()), a7 (stat fn
  // names), a14 (string_agg ORDER BY vs Spark's listagg WITHIN GROUP),
  // w3 (date_diff unit quoting), w4/w8 (epoch/epoch_us — no ANSI
  // microsecond extraction), w6 (IGNORE NULLS placement), w7
  // (count(DISTINCT) OVER rejected by Spark), s2 (time_bucket),
  // s5b/s5c/s8* (engine-watermark CTE shapes written for DuckDB),
  // j14 (DuckDB len() vs Spark length()), w9 (regexp_matches),
  // g4 (AS MATERIALIZED CTE hint), g1b/g2/g3/l47 and the l8e/l8f
  // blockhash replays (ord()/generate_series table functions).

  /** Canonical (column-name-sorted, stringified, row-sorted) form — the
    * same shape the driver's hash compare reduces results to. */
  private def canon(df: DataFrame): (Seq[String], Seq[String]) = {
    val cols = df.columns.sorted.toSeq
    val rows = df.select(cols.map(col): _*).collect()
      .map(_.toSeq.map {
        case null => "␀"
        case b: Array[Byte] => b.map("%02x".format(_)).mkString
        case x => x.toString
      }.mkString("\u0001")).toSeq.sorted
    (cols, rows)
  }

  parity.foreach { name =>
    test(s"E1 parity: $name as SQL text equals the DataFrame form") {
      Engine.open(s, TestSpark.Sf)
      val (sqlCols, sqlRows) = canon(Engine.sql(s, SparkEntry.oracleSql(name)))
      val (dfCols, dfRows) = canon(SparkEntry.queries(name)(s, TestSpark.Sf))
      assert(sqlCols == dfCols, s"column sets differ: $sqlCols vs $dfCols")
      assert(sqlRows.size == dfRows.size,
        s"row counts differ: ${sqlRows.size} vs ${dfRows.size}")
      assert(sqlRows == dfRows, "first diff: " +
        sqlRows.zip(dfRows).find(p => p._1 != p._2).map(_.toString)
          .getOrElse(""))
    }
  }
}
