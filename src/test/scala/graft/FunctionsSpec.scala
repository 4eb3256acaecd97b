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
      val sq = g.sortBy(e => (e._2, e._3)).map(_._4.head).mkString
      (u, g.length.toLong, sq.contains("vcp"))
    }
    val got = SparkEntry.queries("w9_seq_pattern")(s, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .toSeq
    assert(got == ref, s"engine ${got.take(3)} vs ref ${ref.take(3)}")
    assert(got.exists(_._3) && got.exists(!_._3),
      "pattern matches all-or-none of the users — test vacuous")
  }
}
