package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.{Canon, Tables}
import graft.udf.WeightedAvg

/** SURVEY.md §2.4 aggregations (A1–A8, A10).
  *
  * 100 TB notes: every groupBy here compiles to 2-phase HashAggregate
  * (partial map-side combine → shuffle on group keys → final), so shuffle
  * volume is |groups|·|partitions|, not |rows|. DECIMAL/BIGINT buffers are
  * fixed-width in UnsafeRow → stay inside whole-stage codegen. A9 (the
  * 2-phase plan shape itself) is asserted in AggregatesSpec, not a query.
  */
object Aggregates {
  import Canon.{money, asLong, d, ratio}

  private val li = Tables.lineitem _
  private val ord = Tables.orders _

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1 — TPC-H Q1-shaped pricing summary, exact decimal arithmetic.
    "a1_pricing" -> ((s, dir) => {
      val disc  = money(col("l_extendedprice")) *
        (lit(1).cast(Canon.Money) - money(col("l_discount")))
      // keep the product inside DECIMAL(18,4) so the next multiply does not
      // overflow Spark's 38-digit cap (values are ≤ ~1.1e5 with 4 decimals)
      val disc18 = disc.cast(DecimalType(18, 4))
      val charge = disc18 * (lit(1).cast(Canon.Money) + money(col("l_tax")))
      li(s, dir).groupBy(col("l_returnflag"), col("l_linestatus")).agg(
        sum(asLong(col("l_quantity"))).as("sum_qty"),
        d(sum(money(col("l_extendedprice")))).as("sum_base"),
        d(sum(disc18)).as("sum_disc"),
        d(sum(charge)).as("sum_charge"),
        ratio(sum(asLong(col("l_quantity"))), count(lit(1))).as("avg_qty"),
        ratio(sum(money(col("l_extendedprice"))), count(lit(1))).as("avg_price"),
        ratio(sum(money(col("l_discount"))), count(lit(1))).as("avg_disc"),
        count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // A2 — global (no-group) aggregate.
    "a2_global" -> ((s, dir) =>
      li(s, dir).agg(
        count(lit(1)).as("n"),
        sum(asLong(col("l_quantity"))).as("sum_qty"),
        d(sum(money(col("l_extendedprice")))).as("sum_price"),
        min(col("l_shipdate")).as("min_ship"),
        max(col("l_shipdate")).as("max_ship"))),

    // A3 — exact count distinct (expands to 2 aggregates under the hood;
    // at 100 TB prefer A4's HLL sketch when 2% error is acceptable).
    "a3_distinct" -> ((s, dir) =>
      Tables.events(s, dir).groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"),
             count(lit(1)).as("n_events"))
        .orderBy(col("event_type"))),

    // A4 — approx distinct (HLL++). Sketch internals are engine-specific →
    // no oracle hash; AggregatesSpec property-checks it against A3 (±5%)
    // at sf0.001 (src/test/scala/graft/AggregatesSpec.scala).
    "a4_approx_distinct" -> ((s, dir) =>
      Tables.events(s, dir).groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id")).as("n_users_approx"))
        .orderBy(col("event_type"))),

    // A5 — collect_list, order-canonicalized then serialized to a string
    // (string compares are engine-neutral; array encodings are not).
    // 100 TB note: collect_list buffers one group per aggregation buffer —
    // bounded HERE because the input is pre-filtered to negative-balance
    // customers (~10% of a dim table, ≤ |customers per nation|). The
    // general scale path for unbounded groups is a secondary-sort write
    // (repartition by key + sortWithinPartitions) instead of an in-memory
    // list; this query intentionally demonstrates the bounded-dim case.
    "a5_collect" -> ((s, dir) =>
      Tables.customer(s, dir).filter(col("c_acctbal") < 0)
        .groupBy(col("c_nationkey"))
        .agg(expr("array_join(transform(array_sort(collect_list(c_custkey)), x -> cast(x as string)), ',')")
          .as("custkeys"),
          count(lit(1)).as("n"))
        .orderBy(col("c_nationkey"))),

    // A6 — rollup + grouping_id.
    "a6_rollup" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir)
      c.join(n, col("c_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"),
             grouping_id().cast(LongType).as("gid"))
        .orderBy(col("gid"), col("r_name").asc_nulls_first,
                 col("n_name").asc_nulls_first)
    }),

    // A6b — cube: all 4 grouping combinations of (region, nation).
    "a6b_cube" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir)
      c.join(n, col("c_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .cube(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"),
             grouping_id().cast(LongType).as("gid"))
        .orderBy(col("gid"), col("r_name").asc_nulls_first,
                 col("n_name").asc_nulls_first)
    }),

    // A6c — explicit GROUPING SETS through the SQL entry point (E1):
    // region totals, (region, nation) detail, and the grand total —
    // i.e. rollup minus nothing but written as literal sets, exercising
    // the Catalyst GroupingSets path rather than the rollup shorthand.
    "a6c_groupingsets" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT r_name, n_name, count(*) AS n_cust,
          |  CAST(grouping_id(r_name, n_name) AS BIGINT) AS gid
          |FROM customer
          |JOIN nation ON c_nationkey = n_nationkey
          |JOIN region ON n_regionkey = r_regionkey
          |GROUP BY GROUPING SETS ((r_name), (r_name, n_name), ())
          |ORDER BY gid, r_name ASC NULLS FIRST, n_name ASC NULLS FIRST
          |""".stripMargin)
    }),

    // A7 — stats aggs. Spark's stddev/corr/skewness builtins fold doubles
    // in partition order (non-deterministic bit patterns run-to-run), so
    // the canonical form computes exact integer power sums and applies one
    // IEEE formula — bit-stable in any engine. Property tests in
    // AggregatesSpec check the builtins (stddev_samp/corr/var_samp/
    // covar_samp/skewness) against these exact values within tolerance.
    // Moment COMBINATION is done in DECIMAL(38,0): at ~1e12 rows,
    // n*sxx - sx*sx exceeds Long range (ANSI mode would throw); the
    // per-row power sums themselves stay comfortably in BIGINT (q ≤ 50 →
    // q³ ≤ 1.25e5, so sum(q³) fits to ~7e13 rows). The cubic skewness
    // numerator n²·sxxx − 3n·sx·sxx + 2·sx³ fits DECIMAL(38,0) to
    // n ≈ 9e10 rows; past that scale the production path is the builtin
    // single-pass `skewness` (this query's job is the exact oracle form).
    "a7_stats" -> ((s, dir) => {
      val q = asLong(col("l_quantity"))
      val dc = (money(col("l_discount")) * 100).cast(LongType) // cents, exact
      val sums = li(s, dir).agg(
        count(lit(1)).as("n"),
        sum(q).as("sx"), sum(q * q).as("sxx"), sum(q * q * q).as("sxxx"),
        sum(dc).as("sy"), sum(dc * dc).as("syy"),
        sum(q * dc).as("sxy"))
      val big = DecimalType(38, 0)
      def b(c: Column): Column = c.cast(big)
      val n = b(col("n"))
      val varXNum = n * b(col("sxx")) - b(col("sx")) * b(col("sx"))
      val varYNum = n * b(col("syy")) - b(col("sy")) * b(col("sy"))
      val covNum  = n * b(col("sxy")) - b(col("sx")) * b(col("sy"))
      // n²·Σ(x−μ)³ expanded in exact integer sums; population skewness
      // g1 = m3/m2^1.5 collapses to M3/M2^1.5 (the n³ cancels). m2^1.5 is
      // computed as m2·sqrt(m2) — sqrt and multiply are IEEE-exact, unlike
      // libm pow(x, 1.5).
      val m3Num = n * n * b(col("sxxx")) -
        lit(3).cast(big) * n * b(col("sx")) * b(col("sxx")) +
        lit(2).cast(big) * b(col("sx")) * b(col("sx")) * b(col("sx"))
      val nn1 = n * (n - lit(1).cast(big))
      sums.select(
        col("n"),
        ratio(col("sx"), col("n")).as("mean_qty"),
        sqrt(ratio(varXNum, nn1)).as("stddev_qty"),
        (d(covNum) / (sqrt(d(varXNum)) * sqrt(d(varYNum))))
          .as("corr_qty_disc"),
        ratio(varXNum, nn1).as("var_qty"),
        ratio(covNum, nn1).as("covar_qty_disc"),
        (d(m3Num) / (d(varXNum) * sqrt(d(varXNum)))).as("skew_qty"))
    }),

    // A8 — exact interpolated percentiles (p50/p90/p99 of o_totalprice),
    // same linear-interpolation formula as the DuckDB oracle.
    //
    // Scale-safe plan (no single-partition window): the global ranks we
    // need are just 6 longs, so (1) count(*) once → derive target ranks
    // driver-side; (2) range-repartition by (v, key) so partition i holds
    // a contiguous rank range; (3) one lightweight per-partition count agg
    // → rank offsets (collects ≤ #partitions rows, not data); (4) local
    // row_number windows partitioned by partition id (parallel, no global
    // sort on one task); (5) fetch the ≤6 boundary rows and interpolate.
    // Every stage is O(n/p) per task at any scale.
    "a8_percentile" -> ((s, dir) => {
      import graft.core.GlobalRank
      val ps = Seq(0.50, 0.90, 0.99)
      val src = Tables.orders(s, dir)
        .select(col("o_totalprice").as("v"), col("o_orderkey").as("k"))
      val n = src.count()
      val targets = ps.map { p =>
        val r = (n - 1) * p
        val h = math.floor(r).toLong
        (p, h, r - math.floor(r))
      }
      val needed = targets.flatMap { case (_, h, _) => Seq(h, h + 1) }
        .filter(_ < n).distinct
      import s.implicits._
      GlobalRank.withGlobalIndex(src, Seq(col("v"), col("k"))) { wi =>
        val boundary = wi.filter(col("idx").isin(needed: _*))
          .select("idx", "v").collect()
          .map(r => r.getLong(0) -> r.getDouble(1)).toMap
        val rows = targets.map { case (p, h, f) =>
          val lo = boundary(h)
          val hi = boundary.getOrElse(h + 1, lo)
          (p, lo + f * (hi - lo))
        }
        rows.toDF("pct", "val").orderBy("pct")
      }
    }),

    // A12 — approx percentile sketch (the quantile analogue of A4's HLL):
    // engine-private digest → declared ORACLE-LESS; AggregatesSpec bounds
    // it against a8's exact interpolated percentiles. 100 TB: a
    // fixed-size mergeable sketch per partition — the right answer when
    // a8's exact two-pass rank machinery isn't worth the extra job.
    "a12_approx_percentile" -> ((s, dir) =>
      ord(s, dir).agg(
        percentile_approx(col("o_totalprice"),
          array(lit(0.5), lit(0.9), lit(0.99)), lit(10000)).as("pcts"))
        .select(posexplode(col("pcts")))
        .select(col("pos"), col("col").as("approx_val"))),

    // A11 — pivot (long→wide): order counts by status across priorities.
    // The pivot value list is FIXED (not inferred) — deterministic column
    // set, no extra distinct-values job, and the exact shape DuckDB's
    // CASE-sum oracle reproduces. 100 TB: compiles to one 2-phase
    // aggregation with |priorities|·|statuses| cells — no shuffle beyond
    // the groupBy.
    "a11_pivot" -> ((s, dir) =>
      ord(s, dir)
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("F", "O", "P"))
        .orderBy(col("o_orderpriority"))),

    // A13 — filtered / conditional aggregates: the SQL-standard
    // FILTER (WHERE …) clause (run through Spark's own parser via expr),
    // count_if, and the bool_and/bool_or reducers. Exact arithmetic
    // throughout (DECIMAL sum, integer counts, booleans). 100 TB: FILTER
    // folds into the partial aggregate — one 2-phase hash agg, identical
    // cost to the unfiltered form, never a self-join per condition.
    "a13_filtered_agg" -> ((s, dir) =>
      Tables.customer(s, dir)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
             count_if(col("c_acctbal") < 0).as("n_neg"),
             d(expr("sum(CAST(c_acctbal AS DECIMAL(18,2))) " +
                    "FILTER (WHERE c_acctbal > 0)")).as("sum_pos"),
             bool_and(col("c_acctbal") > -1000).as("all_above"),
             bool_or(col("c_acctbal") > 9000).as("any_big"))
        .orderBy(col("c_mktsegment"))),

    // A14 — ordered-set aggregates: the SQL-standard WITHIN GROUP
    // syntax (percentile_cont / percentile_disc / listagg), submitted as
    // SQL text through the engine's own parser. percentile_disc and
    // listagg are exact (a picked value / ordered concat — listagg's
    // within-group order is the aggregated column itself, so equal
    // values make the string total-order-free); percentile_cont
    // interpolates lo + (hi−lo)·f, the same IEEE expression DuckDB
    // evaluates — bit-equality verified at every shipped sf.
    // percentile_disc: Spark picks the smallest value with cume_dist ≥ p
    // (the SQL-standard rule); DuckDB's percentile_disc (unlike its
    // native quantile_disc) implements the SAME rule — probed
    // empirically at p=0.9 for every group size n = 1..300 with zero
    // index divergence (AggregatesSpec "a14 group sizes" guards the
    // probed range), so the hash equality is definitional within that
    // range, not data-luck. DuckDB has
    // no listagg, so the oracle spells it string_agg(… ORDER BY …) —
    // same declared semantics, different surface spelling (not in the
    // SqlSpec parity set for that reason). 100 TB: ordered-set aggs
    // sort per group inside the aggregate — same shuffle shape as A1.
    "a14_ordered_set" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT o_orderstatus,
          |  percentile_cont(0.5) WITHIN GROUP
          |    (ORDER BY CAST(o_totalprice AS DOUBLE)) AS p50,
          |  percentile_disc(0.9) WITHIN GROUP
          |    (ORDER BY CAST(o_totalprice AS DOUBLE)) AS p90d,
          |  listagg(o_orderpriority, ',') WITHIN GROUP
          |    (ORDER BY o_orderpriority) AS prios
          |FROM orders WHERE o_orderkey < 100
          |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
    }),

    // A15 — EXACT weighted median (the a8/a12 family's missing face:
    // a8 interpolates unweighted ranks, a12 sketches): per returnflag,
    // the smallest quantity whose cumulative revenue weight reaches
    // half the group's total. Exact-integer weights (price cents, the
    // a10 convention) so the 2·cw ≥ tot threshold has no IEEE edge.
    // 100 TB: the ONLY pass over raw rows is the (flag, quantity)
    // two-phase weight-mass aggregate; the cumulative window then runs
    // on aggregate cardinality (groups × distinct values), so the
    // per-group ordered scan — the part that can't distribute — never
    // touches data-sized input. For value domains too large to
    // aggregate (continuous weights), a8's GlobalRank machinery is the
    // documented fallback.
    "a15_weighted_median" -> ((s, dir) => {
      val win = org.apache.spark.sql.expressions.Window
      val w = li(s, dir).select(col("l_returnflag"),
          asLong(col("l_quantity")).as("q"),
          round(col("l_extendedprice") * 100, 0).cast(LongType).as("cents"))
        .groupBy(col("l_returnflag"), col("q"))
        .agg(sum(col("cents")).as("wsum"))
      w.withColumn("cw", sum(col("wsum")).over(
          win.partitionBy(col("l_returnflag")).orderBy(col("q"))))
        .withColumn("tot", sum(col("wsum")).over(
          win.partitionBy(col("l_returnflag"))))
        .filter(col("cw") * 2 >= col("tot"))
        .groupBy(col("l_returnflag"))
        .agg(min(col("q")).as("wmedian_qty"),
             max(col("tot")).as("tot_cents"))
        .orderBy(col("l_returnflag"))
    }),

    // A10 — custom typed Aggregator (weighted average) via udaf().
    "a10_wavg" -> ((s, dir) =>
      li(s, dir).select(col("l_returnflag"),
          round(col("l_extendedprice") * 100, 0).cast(LongType).as("cents"),
          asLong(col("l_quantity")).as("qty"))
        .groupBy(col("l_returnflag"))
        .agg(WeightedAvg.fn(col("cents"), col("qty")).as("wavg_price"))
        .orderBy(col("l_returnflag")))
  )

  val oracle: Map[String, String] = Map(
    "a1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_price,
        |  CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_disc,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "a2_global" ->
      """SELECT count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship
        |FROM lineitem""".stripMargin,
    "a3_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "a5_collect" ->
      """SELECT c_nationkey,
        |  string_agg(CAST(c_custkey AS VARCHAR), ',' ORDER BY c_custkey) AS custkeys,
        |  count(*) AS n
        |FROM customer WHERE c_acctbal < 0
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "a6_rollup" ->
      """SELECT r_name, n_name, count(*) AS n_cust,
        |  CAST(GROUPING(r_name, n_name) AS BIGINT) AS gid
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY gid, r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,
    "a6b_cube" ->
      """SELECT r_name, n_name, count(*) AS n_cust,
        |  CAST(GROUPING(r_name, n_name) AS BIGINT) AS gid
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY CUBE(r_name, n_name)
        |ORDER BY gid, r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,
    "a6c_groupingsets" ->
      """SELECT r_name, n_name, count(*) AS n_cust,
        |  CAST(GROUPING(r_name, n_name) AS BIGINT) AS gid
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY GROUPING SETS ((r_name), (r_name, n_name), ())
        |ORDER BY gid, r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,
    "a7_stats" ->
      """WITH t AS (
        |  SELECT CAST(l_quantity AS BIGINT) AS q,
        |         CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS dc
        |  FROM lineitem
        |), sums AS (
        |  SELECT count(*) AS n,
        |    CAST(sum(q) AS BIGINT) AS sx, CAST(sum(q*q) AS BIGINT) AS sxx,
        |    CAST(sum(q*q*q) AS BIGINT) AS sxxx,
        |    CAST(sum(dc) AS BIGINT) AS sy, CAST(sum(dc*dc) AS BIGINT) AS syy,
        |    CAST(sum(q*dc) AS BIGINT) AS sxy
        |  FROM t)
        |SELECT n,
        |  CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean_qty,
        |  sqrt(CAST(n*sxx - sx*sx AS DOUBLE) / CAST(n*(n-1) AS DOUBLE)) AS stddev_qty,
        |  (CAST(n*sxy - sx*sy AS DOUBLE) / CAST(1 AS DOUBLE)) /
        |    (sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) * sqrt(CAST(n*syy - sy*sy AS DOUBLE))) AS corr_qty_disc,
        |  CAST(n*sxx - sx*sx AS DOUBLE) / CAST(n*(n-1) AS DOUBLE) AS var_qty,
        |  CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*(n-1) AS DOUBLE) AS covar_qty_disc,
        |  CAST(CAST(n AS HUGEINT)*n*sxxx - 3*CAST(n AS HUGEINT)*sx*sxx
        |       + 2*CAST(sx AS HUGEINT)*sx*sx AS DOUBLE) /
        |    (CAST(n*sxx - sx*sx AS DOUBLE) * sqrt(CAST(n*sxx - sx*sx AS DOUBLE))) AS skew_qty
        |FROM sums""".stripMargin,
    // f is computed in DOUBLE on both sides ((n-1) exact in double, one
    // IEEE multiply) so the interpolation fraction is bit-identical to the
    // Scala driver-side computation in the Spark implementation.
    "a8_percentile" ->
      """WITH s AS (
        |  SELECT o_totalprice AS v,
        |         row_number() OVER (ORDER BY o_totalprice, o_orderkey) - 1 AS rn
        |  FROM orders
        |), ps AS (SELECT CAST(0.50 AS DOUBLE) AS p
        |          UNION ALL SELECT CAST(0.90 AS DOUBLE)
        |          UNION ALL SELECT CAST(0.99 AS DOUBLE)),
        |ix AS (
        |  SELECT p, CAST(floor(CAST(cnt - 1 AS DOUBLE) * p) AS BIGINT) AS h,
        |         CAST(cnt - 1 AS DOUBLE) * p - floor(CAST(cnt - 1 AS DOUBLE) * p) AS f
        |  FROM ps CROSS JOIN (SELECT count(*) AS cnt FROM orders) t
        |)
        |SELECT ix.p AS pct,
        |       lo.v + ix.f * (COALESCE(hi.v, lo.v) - lo.v) AS val
        |FROM ix JOIN s lo ON lo.rn = ix.h
        |LEFT JOIN s hi ON hi.rn = ix.h + 1
        |ORDER BY pct""".stripMargin,
    "a11_pivot" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS "F",
        |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS "O",
        |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS "P"
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "a14_ordered_set" ->
      """SELECT o_orderstatus,
        |  percentile_cont(0.5) WITHIN GROUP
        |    (ORDER BY CAST(o_totalprice AS DOUBLE)) AS p50,
        |  percentile_disc(0.9) WITHIN GROUP
        |    (ORDER BY CAST(o_totalprice AS DOUBLE)) AS p90d,
        |  string_agg(o_orderpriority, ',' ORDER BY o_orderpriority) AS prios
        |FROM orders WHERE o_orderkey < 100
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "a13_filtered_agg" ->
      """SELECT c_mktsegment, count(*) AS n,
        |  count(*) FILTER (WHERE c_acctbal < 0) AS n_neg,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2)))
        |         FILTER (WHERE c_acctbal > 0) AS DOUBLE) AS sum_pos,
        |  bool_and(c_acctbal > -1000) AS all_above,
        |  bool_or(c_acctbal > 9000) AS any_big
        |FROM customer GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "a15_weighted_median" ->
      """WITH w15 AS (
        |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q,
        |    CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
        |         AS BIGINT) AS wsum
        |  FROM lineitem GROUP BY 1, 2),
        |c15 AS (
        |  SELECT l_returnflag, q, wsum,
        |    sum(wsum) OVER (PARTITION BY l_returnflag ORDER BY q) AS cw,
        |    sum(wsum) OVER (PARTITION BY l_returnflag) AS tot
        |  FROM w15)
        |SELECT l_returnflag, CAST(min(q) AS BIGINT) AS wmedian_qty,
        |  CAST(max(tot) AS BIGINT) AS tot_cents
        |FROM c15 WHERE cw * 2 >= tot
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "a10_wavg" ->
      """SELECT l_returnflag,
        |  CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT) * CAST(l_quantity AS BIGINT)) AS DOUBLE)
        |    / 100.0 / CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS wavg_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
