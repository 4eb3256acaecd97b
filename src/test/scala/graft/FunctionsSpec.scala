package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** F8's declared oracle exclusions (xxhash64 / crc32 / hash use
  * Spark-private seeds or algorithms DuckDB lacks) still get exercised
  * here: fixed known values where the algorithm is standard (CRC-32),
  * determinism + dispersion where it is engine-specific.
  */
class FunctionsSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  test("F8: crc32 matches the standard CRC-32 checksum") {
    import s.implicits._
    val rows = Seq("abc", "").toDF("v")
      .select(col("v"), crc32(col("v")).as("c")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows("abc") == 891568578L) // 0x352441C2, CRC-32/IEEE of "abc"
    assert(rows("") == 0L)
  }

  test("F8: xxhash64 and hash are deterministic and disperse over customer") {
    val df = core.Tables.customer(s, TestSpark.Sf)
      .select(col("c_custkey"),
        xxhash64(col("c_name")).as("xx"),
        hash(col("c_name")).as("mm"))
    val a = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val b = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(a.sameElements(b), "hash functions must be run-deterministic")
    // distinct names hash apart (no 64-bit collisions expected at dim size)
    assert(a.map(_._2).distinct.length == a.length)
    assert(a.map(_._3).distinct.length > a.length * 9 / 10) // 32-bit: allow rare collisions
  }

  test("W9: batch sequence-pattern detection equals an in-memory " +
       "ordered-subsequence reference, with both outcomes present") {
    val s = TestSpark.spark
    val evs = graft.core.Tables.events(s, TestSpark.Sf)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map { r =>
        val i = r.getTimestamp(1).toInstant // FULL µs precision: an
        // ms-truncated sort key would order same-ms ties differently
        (r.getLong(0), i.getEpochSecond * 1000000L + i.getNano / 1000L,
         r.getLong(2), r.getString(3))
      }
    val ref = evs.groupBy(_._1).toSeq.sortBy(_._1).map { case (u, g) =>
      val sq = g.sortBy(e => (e._2, e._3)).map(e => letterOf(e._4)).mkString
      (u, g.length.toLong, sq.contains("vcp"))
    }
    val got = SparkEntry.queries("w9_seq_pattern")(s, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .toSeq
    assert(got == ref, s"engine ${got.take(3)} vs ref ${ref.take(3)}")
    assert(got.exists(_._3) && got.exists(!_._3),
      "pattern matches all-or-none of the users — test vacuous")
  }

  /** The w9/w9b explicit letter map (unknown types → 'x', never a
    * first-letter shortcut). */
  private def letterOf(t: String): Char = t match {
    case "view" => 'v'
    case "click" => 'c'
    case "purchase" => 'p'
    case _ => 'x'
  }

  /** Collected events as (user, tsu µs, event_id, type). */
  private def collectedEvents(s: org.apache.spark.sql.SparkSession) =
    graft.core.Tables.events(s, TestSpark.Sf)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map { r =>
        val i = r.getTimestamp(1).toInstant
        (r.getLong(0), i.getEpochSecond * 1000000L + i.getNano / 1000L,
         r.getLong(2), r.getString(3))
      }

  /** The w9b max-start DP, replayed independently in memory. */
  private def skipDpRef(evs: Array[(Long, Long, Long, String)],
                        pattern: String, windowUs: Long): Map[Long, Long] =
    evs.groupBy(_._1).map { case (u, g) =>
      val n = pattern.length
      val m = Array.fill(n - 1)(-1L)
      var cnt = 0L
      g.sortBy(e => (e._2, e._3)).foreach { e =>
        val l = letterOf(e._4)
        val t = e._2
        if (l == pattern(n - 1) && m(n - 2) >= t - windowUs) cnt += 1
        val old = m.clone()
        for (k <- 0 until n - 1) {
          if (l == pattern(k)) {
            if (k == 0) m(0) = math.max(old(0), t)
            else if (old(k - 1) >= 0) m(k) = math.max(old(k), old(k - 1))
          }
        }
      }
      u -> cnt
    }

  test("W9b: skip-till-next-match completions equal the in-memory " +
       "max-start DP for the canonical AND a second pattern, " +
       "non-vacuously") {
    val s = TestSpark.spark
    import org.apache.spark.sql.functions._
    import graft.queries.Windows.{skipPatternCount, SkipWindowUs}
    val evs = collectedEvents(s)
    val refVcp = skipDpRef(evs, "vcp", SkipWindowUs)
    val gotVcp = SparkEntry.queries("w9b_skip_pattern")(s, TestSpark.Sf)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(gotVcp == refVcp,
      s"vcp: engine ${gotVcp.toSeq.sortBy(_._1).take(3)} vs " +
      s"ref ${refVcp.toSeq.sortBy(_._1).take(3)}")
    assert(refVcp.values.sum > 0 && refVcp.values.exists(_ == 0L),
      "vcp completions all-or-none — test vacuous")
    // a second, repeated-letter pattern through the SAME generic fold:
    // two clicks then a purchase (one event must never serve both 'c'
    // positions — the simultaneous-update claim)
    val refCcp = skipDpRef(evs, "ccp", SkipWindowUs)
    val letterCol = when(col("event_type") === "view", lit("v"))
      .when(col("event_type") === "click", lit("c"))
      .when(col("event_type") === "purchase", lit("p"))
      .otherwise(lit("x"))
    val gotCcp = graft.core.Tables.events(s, TestSpark.Sf)
      .select(col("user_id"),
        struct(unix_micros(col("ts")).as("tsu"), col("event_id"),
          letterCol.as("l")).as("e"))
      .groupBy(col("user_id"))
      .agg(array_sort(collect_list(col("e"))).as("es"))
      .select(col("user_id"),
        skipPatternCount(col("es"), "ccp", SkipWindowUs).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotCcp == refCcp,
      s"ccp: engine ${gotCcp.toSeq.sortBy(_._1).take(3)} vs " +
      s"ref ${refCcp.toSeq.sortBy(_._1).take(3)}")
    assert(refCcp.values.sum > 0, "ccp never completes — test vacuous")
  }

  test("W9b: the vcp/24h form equals the s8c streaming funnel's " +
       "conversion multiset (pattern and window coincide)") {
    val s = TestSpark.spark
    val funnel = SparkEntry.queries("s8c_funnel_wide")(s, TestSpark.Sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w9b = SparkEntry.queries("w9b_skip_pattern")(s, TestSpark.Sf)
      .collect().map(r => r.getLong(0) -> r.getLong(2))
      .filter(_._2 > 0L).toMap
    assert(funnel.nonEmpty, "s8c converted nobody — equivalence vacuous")
    assert(w9b == funnel,
      s"w9b ${w9b.toSeq.sortBy(_._1).take(4)} vs " +
      s"s8c ${funnel.toSeq.sortBy(_._1).take(4)}")
  }

  test("W9/W9b hyperactive-key cap: truncation is deterministic (first " +
       "cap events by (ts, event_id)), n_events keeps the uncapped " +
       "count as the overflow flag, and the shipped cap is unreachable") {
    val s = TestSpark.spark
    import s.implicits._
    import graft.queries.Windows.{w9Converted, w9bCounts, MaxEventsPerKey}
    def ts(sec: Int) = java.sql.Timestamp.from(
      java.time.Instant.parse("2024-01-01T00:00:00Z").plusSeconds(sec))
    // user 1: the only v·c·p lies BEYOND a cap of 4 (prefix v,x,x,v);
    // user 2: converts inside the first 3 events;
    // user 3: a ts TIE at the cap boundary — (ts,eid) order keeps the
    // completing 'p' (eid 30) and drops the 'x' (eid 31); an ordering
    // by anything else would flip the result.
    val evs = Seq(
      (1L, ts(1), 10L, "view"), (1L, ts(2), 11L, "error"),
      (1L, ts(3), 12L, "error"), (1L, ts(4), 13L, "view"),
      (1L, ts(5), 14L, "view"), (1L, ts(6), 15L, "click"),
      (1L, ts(7), 16L, "purchase"), (1L, ts(8), 17L, "error"),
      (1L, ts(9), 18L, "error"), (1L, ts(10), 19L, "error"),
      (2L, ts(1), 20L, "view"), (2L, ts(2), 21L, "click"),
      (2L, ts(3), 22L, "purchase"), (2L, ts(4), 23L, "error"),
      (3L, ts(1), 28L, "view"), (3L, ts(2), 29L, "click"),
      (3L, ts(3), 30L, "purchase"), (3L, ts(3), 31L, "error")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val W = graft.queries.Windows.SkipWindowUs

    val cap4 = w9Converted(evs, 4).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(cap4(1L) == ((10L, false)),
      "user 1 must NOT convert at cap 4 (match lies beyond the cap) " +
      "and must report the uncapped n_events=10 as the overflow flag")
    assert(cap4(2L) == ((4L, true)), "user 2 converts inside the cap")
    assert(cap4(3L) == ((4L, true)),
      "user 3's ts tie must resolve by event_id (keep eid 30 'p')")
    val uncapped = w9Converted(evs, MaxEventsPerKey).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(uncapped(1L), "user 1 converts when uncapped")

    val b4 = w9bCounts(evs, "vcp", W, 4).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(b4(1L) == ((10L, 0L)) && b4(2L) == ((4L, 1L)) &&
           b4(3L) == ((4L, 1L)),
      s"w9b cap semantics: $b4")
    val bFull = w9bCounts(evs, "vcp", W, MaxEventsPerKey).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(bFull(1L) == 1L, "user 1 completes once when uncapped")

    // the shipped cap is unreachable at every sf: the corpus' max
    // per-user cardinality sits orders of magnitude under 2^20
    val maxPerUser = graft.core.Tables.events(s, TestSpark.Sf)
      .groupBy("user_id").count().agg(max("count")).collect()(0).getLong(0)
    assert(maxPerUser < MaxEventsPerKey / 100,
      s"corpus max per-user events $maxPerUser approaches the cap")
  }
}
