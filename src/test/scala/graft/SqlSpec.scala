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
  * is covered by the driver's DuckDB gate instead; this sweep covers the
  * ANSI-portable core (joins, aggregates, windows, set ops, sorts,
  * projections, plus the S1 stream-vs-SQL equivalence).
  */
class SqlSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  private val parity = Seq(
    "src1_scan",
    "j1_inner", "j3_outer", "j4_semi", "j5_anti", "j6_theta", "j7_range",
    "j8_asof",
    "a1_pricing", "a2_global", "a3_distinct",
    "o1_sort", "o2_topk",
    "u1_union", "u2_intersect", "u3_except", "u4_unpivot",
    "w1_rank", "w2_topn", "w5_firstlast", "a10_wavg",
    "j2_broadcast", "s5_interval_join",
    "p1_project", "p2_filter", "p3_case",
    "s1_tumbling", "s4_stream_static", "s6_dedup",
    "j11_scalar_subquery", "j12_recursive", "j13_lateral",
    "a13_filtered_agg", "u5_intersect_all", "u6_except_all")

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
