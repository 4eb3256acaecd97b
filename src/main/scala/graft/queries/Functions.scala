package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables

/** SURVEY.md §2.8 scalar function families F1–F9 — one canonical query per
  * family, every output column deterministic and DuckDB-reproducible.
  *
  * Declared exclusions (engine-specific by nature, kept out of the hashed
  * output): `rand`/`uuid`/`monotonically_increasing_id`; `xxhash64`/
  * `crc32`/`hash` (Spark-private seeds / algorithms DuckDB lacks — F8
  * hashes via md5/sha2, which are algorithm-stable everywhere, and the
  * excluded three are test-exercised in FunctionsSpec); libm
  * transcendentals (`exp`/`ln`/`log10`/`cbrt`/`pow`) whose last-bit
  * rounding is implementation-defined — `sqrt` stays (IEEE-exact).
  *
  * 100 TB notes: every family is a pure per-row projection — map-side
  * only, whole-stage-codegen'd, no shuffle except the contract's final
  * ORDER BY. String/JSON parsing cost scales linearly and partitions
  * perfectly.
  */
object Functions {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // F1 — string family over customer.
    "f1_string" -> ((s, d) =>
      Tables.customer(s, d).select(
        col("c_custkey"),
        concat(col("c_name"), lit("!")).as("bang"),
        concat_ws("|", col("c_name"), col("c_mktsegment")).as("joined"),
        upper(col("c_mktsegment")).as("up"),
        lower(col("c_name")).as("lo"),
        length(col("c_name")).as("len"),
        substring(col("c_name"), 1, 8).as("sub"),
        trim(col("c_name")).as("trimmed"),
        lpad(col("c_custkey").cast(StringType), 8, "0").as("padded"),
        rpad(col("c_mktsegment"), 12, ".").as("rpadded"),
        expr("replace(c_name, '#', '-')").as("repl"),
        regexp_replace(col("c_name"), "[0-9]", "*").as("masked"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"),
        reverse(col("c_mktsegment")).as("rev"),
        instr(col("c_name"), "0").as("pos0"),
        col("c_name").startsWith("Customer").as("is_cust"),
        col("c_name").like("%1%").as("has1"),
        initcap(col("c_mktsegment")).as("cap"),
        repeat(col("c_mktsegment"), 2).as("doubled"),
        translate(col("c_name"), "123", "abc").as("trans"),
        format_string("%s-%05d", col("c_mktsegment"), col("c_custkey"))
          .as("fmt"),
        ltrim(concat(lit("  "), col("c_name"))).as("ltrimmed"),
        rtrim(concat(col("c_name"), lit("  "))).as("rtrimmed"),
        col("c_name").rlike("[0-9]{3}").as("has3digits"),
        col("c_mktsegment").endsWith("E").as("ends_e"))
        .orderBy(col("c_custkey"))),

    // F2 — date/time family over events (real h/m/s components) under UTC.
    "f2_datetime" -> ((s, d) =>
      Tables.events(s, d).select(
        col("event_id"),
        year(col("ts")).as("y"),
        month(col("ts")).as("mo"),
        dayofmonth(col("ts")).as("dom"),
        hour(col("ts")).as("h"),
        minute(col("ts")).as("mi"),
        second(col("ts")).as("sec"),
        dayofweek(col("ts")).as("dow"),
        date_trunc("HOUR", col("ts")).as("hour_start"),
        (col("ts") + expr("INTERVAL 1 DAY")).as("next_day"),
        datediff(lit("2024-03-01").cast(DateType), col("ts")).as("days_to_mar"),
        unix_timestamp(col("ts")).as("epoch_s"),
        date_format(col("ts"), "yyyy-MM-dd HH").as("fmt"),
        last_day(col("ts")).as("eom"),
        add_months(col("ts"), 2).as("plus2m"),
        date_add(col("ts").cast(DateType), 5).as("plus5d"),
        date_sub(col("ts").cast(DateType), 3).as("minus3d"),
        // both sides first-of-month at midnight → exact integer months
        months_between(lit("2024-06-01").cast(DateType),
                       date_trunc("month", col("ts"))).as("mb"),
        next_day(col("ts"), "Mon").as("next_mon"),
        from_unixtime(unix_timestamp(col("ts"))).as("from_unix"),
        to_date(col("ts")).as("as_date"),
        to_timestamp(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
          .as("ts_sec"))
        .orderBy(col("event_id"))),

    // F3 — math family over part (no libm transcendentals except sqrt).
    "f3_math" -> ((s, d) =>
      Tables.part(s, d).select(
        col("p_partkey"),
        round(col("p_retailprice"), 0).as("rounded"),
        abs(col("p_size") - 25).as("absdiff"),
        ceil(col("p_retailprice") / 100.0).as("ceil100"),
        floor(col("p_retailprice") / 100.0).as("floor100"),
        sqrt(col("p_size").cast(DoubleType)).as("root"),
        pmod(col("p_partkey"), lit(7)).as("m7"),
        signum(col("p_size") - 25).cast(IntegerType).as("sgn"),
        greatest(col("p_size"), lit(25)).as("hi"),
        least(col("p_size"), lit(25)).as("lo"),
        // bround (HALF_EVEN) on exact DECIMAL input: ties like x.50 are
        // exactly representable, so banker's rounding is bit-portable
        bround(col("p_retailprice").cast(DecimalType(18, 2)) * 2, 0)
          .cast(DoubleType).as("beven"))
        .orderBy(col("p_partkey"))),

    // F4 — array + higher-order functions over tokenized documents.
    "f4_array" -> ((s, d) => {
      val toks = split(col("text"), " ")
      Tables.documents(s, d)
        .withColumn("t1", toks)
        .withColumn("t2", reverse(toks))
        .select(
        col("doc_id"),
        size(toks).cast(LongType).as("n_tokens"),
        size(array_distinct(toks)).cast(LongType).as("n_distinct"),
        element_at(array_sort(toks), 1).as("first_sorted"),
        // sort_array with asc=false — the descending sibling of array_sort
        element_at(sort_array(toks, asc = false), 1).as("last_sorted"),
        array_contains(toks, "the").as("has_the"),
        array_max(transform(toks, t => length(t))).cast(LongType).as("max_len"),
        array_min(transform(toks, t => length(t))).cast(LongType).as("min_len"),
        aggregate(toks, lit(0L), (acc, t) => acc + length(t)).as("total_chars"),
        array_join(slice(array_sort(toks), 1, 3), "_").as("first3"),
        exists(toks, t => length(t) > 8).as("has_long"),
        array_join(transform(arrays_zip(col("t1"), col("t2")),
          p => concat_ws("~", p.getField("t1"), p.getField("t2"))), "|")
          .as("zipped"),
        array_join(flatten(array(slice(toks, 1, 2), slice(toks, 3, 2))), "_")
          .as("flat4"),
        forall(toks, t => length(t) > lit(0)).as("all_nonempty"))
        .orderBy(col("doc_id"))
    }),

    // F5 — map family: maps built from the events.props JSON payload.
    // The oracle reproduces the *values* (k, 2k, sizes) — map internals
    // are not SQL-portable, the value semantics are.
    "f5_map" -> ((s, d) => {
      // parse the JSON ONCE in its own projection: get_json_object is
      // referenced by six downstream map expressions, and materializing
      // the parsed value guarantees one parse per row regardless of how
      // far codegen subexpression elimination reaches (same pattern as
      // the l6_ngrams lambda fix)
      val k = col("k")
      val m = map(lit("k"), k, lit("k2"), k * 2)
      val m2 = map_concat(m, map(lit("j"), lit(1)))
      val me = map_from_entries(array(
        struct(lit("a").as("key"), k.as("value")),
        struct(lit("b").as("key"), (k * 3).as("value"))))
      val tv = transform_values(m, (_, v) => v + 100)
      Tables.events(s, d)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast(IntegerType).as("k"))
        .select(
        col("event_id"),
        element_at(m, "k").as("k1"),
        element_at(m, "k2").as("k2"),
        size(m2).as("n_keys"),
        array_join(map_keys(m2), ",").as("keys"),
        element_at(map_values(m2), 3).as("last_val"),
        element_at(me, "b").as("mfe_b"),
        element_at(tv, "k2").as("tv_k2"))
        .orderBy(col("event_id"))
    }),

    // F6 — JSON family over events.props (shape {"k": <int>}).
    "f6_json" -> ((s, d) => {
      val schema = StructType(Seq(StructField("k", IntegerType)))
      Tables.events(s, d)
        .select(col("event_id"), col("props"),
                json_tuple(col("props"), "k").as("kt"))
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast(IntegerType).as("k_path"),
          col("kt").cast(IntegerType).as("k_tuple"),
          from_json(col("props"), schema).getField("k").as("k_struct"),
          to_json(struct(get_json_object(col("props"), "$.k")
            .cast(IntegerType).as("k"))).as("rebuilt"),
          // constant-folded schema inference; oracle pins the literal
          schema_of_json(lit("""{"k": 1}""")).as("inferred"))
        .orderBy(col("event_id"))
    }),

    // F7 — explode/UDTF-shape: positional word explosion of documents.
    "f7_explode" -> ((s, d) =>
      Tables.documents(s, d).filter(col("doc_id") < 50)
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .select(col("doc_id"), col("pos"), col("col").as("word"))
        .orderBy(col("doc_id"), col("pos"))),

    // F7b — explode_outer: docs with no token longer than 6 chars keep a
    // NULL row (threshold chosen so BOTH branches occur in the corpus:
    // ~1/5 of docs have no long token, the rest have a few).
    "f7b_explode_outer" -> ((s, d) => {
      val longToks = filter(split(col("text"), " "), t => length(t) > 6)
      Tables.documents(s, d).filter(col("doc_id") < 50)
        .select(col("doc_id"), explode_outer(longToks).as("word"))
        .orderBy(col("doc_id"), col("word").asc_nulls_first)
    }),

    // F7c — stack: per-doc stats pivoted into (metric, val) rows.
    "f7c_stack" -> ((s, d) =>
      Tables.documents(s, d).filter(col("doc_id") < 50)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast(LongType).as("n_tok"),
          length(col("text")).cast(LongType).as("n_chr"))
        .selectExpr("doc_id",
          "stack(2, 'n_tokens', n_tok, 'n_chars', n_chr) AS (metric, val)")
        .orderBy(col("doc_id"), col("metric"))),

    // F7d — inline: explode an array<struct> into its columns.
    "f7d_inline" -> ((s, d) => {
      val toks = split(col("text"), " ")
      Tables.documents(s, d).filter(col("doc_id") < 50)
        .select(col("doc_id"), inline(array(
          struct(lit("first").as("k"), element_at(toks, 1).as("v")),
          struct(lit("last").as("k"), element_at(toks, -1).as("v")))))
        .orderBy(col("doc_id"), col("k"))
    }),

    // F8 — algorithm-stable hashes (md5 / sha2-256); Spark-specific
    // xxhash64/crc32/hash are excluded from the oracle by declaration.
    "f8_hash" -> ((s, d) =>
      Tables.customer(s, d).select(
        col("c_custkey"),
        md5(col("c_name")).as("h_md5"),
        sha2(col("c_name"), 256).as("h_sha256"))
        .orderBy(col("c_custkey"))),

    // F9 — cast semantics under ANSI mode (Spark 4 default): try_cast
    // for fallible casts, explicit floor for double→int (ANSI cast
    // truncates where DuckDB's cast rounds — declared difference).
    "f9_cast" -> ((s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"),
        col("o_orderkey").cast(StringType).as("key_str"),
        // bad_int — try_cast semantics with a parse guard. Spark's TRY
        // eval mode pays a THROWN EXCEPTION per failing row (~17 µs
        // each: measured ~2.5 s of this query's ~2.7-3.0 s captures on
        // the all-invalid priority column at sf0.1). The regex guard
        // returns NULL
        // directly for strings that cannot possibly parse as an int,
        // short-circuiting the exception path while keeping the genuine
        // try_cast for parseable strings (whitespace trim and overflow→
        // NULL semantics preserved: the guard's char class matches
        // exactly the control/space chars UTF8String trims, and
        // overflowing digit strings pass the guard into try_cast).
        // Identical result set, ~7× faster — the pattern to reach for
        // whenever try_cast meets a mostly-invalid column at scale.
        when(col("o_orderpriority")
               .rlike("^[\\x00-\\x20]*[+-]?[0-9]+[\\x00-\\x20]*$"),
             expr("try_cast(o_orderpriority AS INT)")).as("bad_int"),
        expr("try_cast(substring(o_orderpriority, 1, 1) AS INT)")
          .as("prio_num"),
        floor(col("o_totalprice")).as("price_floor"),
        col("o_orderdate").cast(DateType).as("odate"),
        col("o_orderkey").cast(DoubleType).as("key_dbl"))
        .orderBy(col("o_orderkey"))),

    // F10 — VARIANT (Spark 4's binary semi-structured type): parse the
    // JSON payload ONCE into variant, then typed-path extraction. Unlike
    // f6's string-walking get_json_object, variant parses each document a
    // single time into a binary tree that every later variant_get shreds
    // without re-parsing — at 100 TB this is the difference between
    // O(fields) JSON re-parses per row and one. The variant value itself
    // is engine-private, so the hashed output is the EXTRACTED bigint —
    // aggregated exactly — never the variant bytes.
    "f10_variant" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          expr("variant_get(parse_json(props), '$.k', 'bigint')").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
             sum(col("k")).as("sum_k"),
             min(col("k")).as("min_k"),
             max(col("k")).as("max_k"),
             countDistinct(col("k")).as("n_k"))
        .orderBy(col("event_type"))),

    // F11 — bitwise family: scalar &, |, ^, ~, shifts, bit_count in the
    // pre-aggregation projection, then the bit_and/bit_or/bit_xor
    // AGGREGATES per line number. All values are exact integers; the
    // only engine divergence risk is syntax (DuckDB spells xor as a
    // function and sums integers into HUGEINT — the oracle casts back).
    // 100 TB: pure codegen'd per-row ops + one 2-phase aggregate.
    "f11_bitwise" -> ((s, d) =>
      Tables.lineitem(s, d).select(
          col("l_linenumber"),
          expr("l_orderkey & l_partkey").as("band"),
          expr("l_orderkey | l_partkey").as("bor"),
          expr("l_orderkey ^ l_partkey").as("bxor"),
          expr("~l_orderkey").as("bnot"),
          expr("shiftleft(l_suppkey, 3)").as("shl"),
          expr("shiftright(l_orderkey, 2)").as("shr"),
          bit_count(col("l_orderkey")).cast(LongType).as("nbits"))
        .groupBy(col("l_linenumber"))
        .agg(count(lit(1)).as("n"),
             expr("bit_and(band)").as("agg_and"),
             expr("bit_or(bor)").as("agg_or"),
             expr("bit_xor(bxor)").as("agg_xor"),
             sum(col("bnot")).as("sum_not"),
             sum(col("shl")).as("sum_shl"),
             sum(col("shr")).as("sum_shr"),
             sum(col("nbits")).as("sum_bits"))
        .orderBy(col("l_linenumber")))
  )

  val oracle: Map[String, String] = Map(
    "f1_string" ->
      """SELECT c_custkey,
        |  c_name || '!' AS bang,
        |  concat_ws('|', c_name, c_mktsegment) AS joined,
        |  upper(c_mktsegment) AS up, lower(c_name) AS lo,
        |  CAST(length(c_name) AS INT) AS len,
        |  substring(c_name, 1, 8) AS sub,
        |  trim(c_name) AS trimmed,
        |  lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
        |  rpad(c_mktsegment, 12, '.') AS rpadded,
        |  replace(c_name, '#', '-') AS repl,
        |  regexp_replace(c_name, '[0-9]', '*', 'g') AS masked,
        |  regexp_extract(c_name, '([0-9]+)', 1) AS digits,
        |  reverse(c_mktsegment) AS rev,
        |  CAST(strpos(c_name, '0') AS INT) AS pos0,
        |  starts_with(c_name, 'Customer') AS is_cust,
        |  c_name LIKE '%1%' AS has1,
        |  upper(substring(lower(c_mktsegment), 1, 1))
        |    || substring(lower(c_mktsegment), 2) AS cap, -- initcap emulation: valid because c_mktsegment is single-word; Spark's initcap capitalizes PER WORD, so a multi-word column would need per-word emulation here
        |
        |  repeat(c_mktsegment, 2) AS doubled,
        |  translate(c_name, '123', 'abc') AS trans,
        |  printf('%s-%05d', c_mktsegment, c_custkey) AS fmt,
        |  ltrim('  ' || c_name) AS ltrimmed,
        |  rtrim(c_name || '  ') AS rtrimmed,
        |  regexp_matches(c_name, '[0-9]{3}') AS has3digits,
        |  ends_with(c_mktsegment, 'E') AS ends_e
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "f2_datetime" ->
      """SELECT event_id,
        |  CAST(year(ts) AS INT) AS y, CAST(month(ts) AS INT) AS mo,
        |  CAST(day(ts) AS INT) AS dom, CAST(hour(ts) AS INT) AS h,
        |  CAST(minute(ts) AS INT) AS mi,
        |  CAST(floor(second(ts)) AS INT) AS sec,
        |  CAST(dayofweek(ts) + 1 AS INT) AS dow,
        |  CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
        |  CAST(ts + INTERVAL 1 DAY AS TIMESTAMP) AS next_day,
        |  CAST(date_diff('day', CAST(ts AS DATE), DATE '2024-03-01') AS INT) AS days_to_mar,
        |  CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS epoch_s,
        |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H') AS fmt,
        |  CAST(last_day(CAST(ts AS DATE)) AS DATE) AS eom,
        |  CAST(CAST(ts AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus2m,
        |  CAST(ts AS DATE) + 5 AS plus5d,
        |  CAST(ts AS DATE) - 3 AS minus3d,
        |  CAST(datediff('month', date_trunc('month', ts), DATE '2024-06-01') AS DOUBLE) AS mb,
        |  CAST(ts AS DATE) + CAST(7 - ((dayofweek(ts) + 6) % 7) AS INT) AS next_mon,
        |  strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M:%S') AS from_unix,
        |  CAST(ts AS DATE) AS as_date,
        |  CAST(date_trunc('second', ts) AS TIMESTAMP) AS ts_sec
        |FROM events ORDER BY event_id""".stripMargin,
    "f3_math" ->
      """SELECT p_partkey,
        |  round(p_retailprice, 0) AS rounded,
        |  CAST(abs(p_size - 25) AS INT) AS absdiff,
        |  CAST(ceil(p_retailprice / 100.0) AS BIGINT) AS ceil100,
        |  CAST(floor(p_retailprice / 100.0) AS BIGINT) AS floor100,
        |  sqrt(CAST(p_size AS DOUBLE)) AS root,
        |  p_partkey % 7 AS m7,
        |  CAST(sign(p_size - 25) AS INT) AS sgn,
        |  CAST(greatest(p_size, 25) AS INT) AS hi,
        |  CAST(least(p_size, 25) AS INT) AS lo,
        |  CAST(round_even(CAST(p_retailprice AS DECIMAL(18,2)) * 2, 0) AS DOUBLE) AS beven
        |FROM part ORDER BY p_partkey""".stripMargin,
    "f4_array" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        |SELECT doc_id,
        |  CAST(len(toks) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
        |  list_sort(toks)[1] AS first_sorted,
        |  list_reverse_sort(toks)[1] AS last_sorted,
        |  list_contains(toks, 'the') AS has_the,
        |  CAST(list_aggregate(list_transform(toks, x -> length(x)), 'max') AS BIGINT) AS max_len,
        |  CAST(list_aggregate(list_transform(toks, x -> length(x)), 'min') AS BIGINT) AS min_len,
        |  CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS total_chars,
        |  array_to_string(list_sort(toks)[1:3], '_') AS first3,
        |  len(list_filter(toks, x -> length(x) > 8)) > 0 AS has_long,
        |  array_to_string(list_transform(generate_series(1, len(toks)),
        |    i -> toks[i] || '~' || list_reverse(toks)[i]), '|') AS zipped,
        |  array_to_string(flatten([toks[1:2], toks[3:4]]), '_') AS flat4,
        |  len(list_filter(toks, x -> length(x) > 0)) = len(toks) AS all_nonempty
        |FROM t ORDER BY doc_id""".stripMargin,
    "f5_map" ->
      """WITH t AS (SELECT event_id,
        |  CAST(regexp_extract(props, '"k": ?(-?[0-9]+)', 1) AS INT) AS k
        |  FROM events)
        |SELECT event_id, k AS k1, k * 2 AS k2, 3 AS n_keys,
        |  'k,k2,j' AS keys, 1 AS last_val,
        |  k * 3 AS mfe_b, k * 2 + 100 AS tv_k2
        |FROM t ORDER BY event_id""".stripMargin,
    "f6_json" ->
      """WITH t AS (SELECT event_id,
        |  CAST(regexp_extract(props, '"k": ?(-?[0-9]+)', 1) AS INT) AS k
        |  FROM events)
        |SELECT event_id, k AS k_path, k AS k_tuple, k AS k_struct,
        |  '{"k":' || CAST(k AS VARCHAR) || '}' AS rebuilt,
        |  'STRUCT<k: BIGINT>' AS inferred
        |FROM t ORDER BY event_id""".stripMargin,
    "f7_explode" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents WHERE doc_id < 50),
        |e AS (SELECT doc_id, toks,
        |        unnest(generate_series(1, len(toks))) AS i FROM d)
        |SELECT doc_id, CAST(i - 1 AS INT) AS pos, toks[i] AS word
        |FROM e ORDER BY doc_id, pos""".stripMargin,
    "f7b_explode_outer" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> length(x) > 6) AS l
        |  FROM documents WHERE doc_id < 50)
        |SELECT doc_id,
        |  unnest(CASE WHEN len(l) = 0 THEN [NULL] ELSE l END) AS word
        |FROM d ORDER BY doc_id, word NULLS FIRST""".stripMargin,
    "f7c_stack" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |    CAST(length(text) AS BIGINT) AS n_chr
        |  FROM documents WHERE doc_id < 50)
        |SELECT doc_id, 'n_tokens' AS metric, n_tok AS val FROM b
        |UNION ALL SELECT doc_id, 'n_chars', n_chr FROM b
        |ORDER BY doc_id, metric""".stripMargin,
    "f7d_inline" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents WHERE doc_id < 50)
        |SELECT doc_id, 'first' AS k, toks[1] AS v FROM t
        |UNION ALL SELECT doc_id, 'last', toks[len(toks)] FROM t
        |ORDER BY doc_id, k""".stripMargin,
    "f8_hash" ->
      """SELECT c_custkey, md5(c_name) AS h_md5, sha256(c_name) AS h_sha256
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "f9_cast" ->
      """SELECT o_orderkey,
        |  CAST(o_orderkey AS VARCHAR) AS key_str,
        |  TRY_CAST(o_orderpriority AS INT) AS bad_int,
        |  TRY_CAST(substring(o_orderpriority, 1, 1) AS INT) AS prio_num,
        |  CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
        |  CAST(o_orderdate AS DATE) AS odate,
        |  CAST(o_orderkey AS DOUBLE) AS key_dbl
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "f10_variant" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(k) AS BIGINT) AS sum_k,
        |  min(k) AS min_k, max(k) AS max_k,
        |  count(DISTINCT k) AS n_k
        |FROM (SELECT event_type,
        |        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |      FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "f11_bitwise" ->
      """SELECT l_linenumber, count(*) AS n,
        |  bit_and(l_orderkey & l_partkey) AS agg_and,
        |  bit_or(l_orderkey | l_partkey) AS agg_or,
        |  bit_xor(xor(l_orderkey, l_partkey)) AS agg_xor,
        |  CAST(sum(~l_orderkey) AS BIGINT) AS sum_not,
        |  CAST(sum(l_suppkey << 3) AS BIGINT) AS sum_shl,
        |  CAST(sum(l_orderkey >> 2) AS BIGINT) AS sum_shr,
        |  CAST(sum(bit_count(l_orderkey)) AS BIGINT) AS sum_bits
        |FROM lineitem
        |GROUP BY l_linenumber ORDER BY l_linenumber""".stripMargin
  )
}
