package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Canonicalization protocol shared by every oracle-checked query
  * (SURVEY.md §5.3). The driver hash-compares Spark parquet output against
  * DuckDB running the paired SQL, so every float that reaches the output
  * must be BIT-IDENTICAL across both engines. Rules:
  *
  *  1. Money columns in the testdata are exactly 2-decimal doubles and
  *     quantities are integer-valued doubles (verified in FIXTURES.md /
  *     round-1 checks). Cast them to DECIMAL / BIGINT *before* any
  *     arithmetic: all sums/products are then exact in both engines.
  *  2. Convert exact decimals to double only at the very end
  *     (`CAST(dec AS DOUBLE)`). While `|value * 10^scale| < 2^53` both
  *     engines produce the correctly-rounded (hence identical) double.
  *  3. Ratios (avg etc.): compute `CAST(sum_dec AS DOUBLE) /
  *     CAST(count AS DOUBLE)` — two exact doubles, one IEEE division —
  *     instead of decimal division (whose precision/scale rules differ
  *     between Spark and DuckDB).
  *  4. Every query ends with a total ORDER BY (unique tie-break).
  *
  * 100 TB note: DECIMAL aggregation is Tungsten-native (UnsafeRow fixed
  * width for precision ≤ 38) and keeps 2-phase partial aggregation —
  * determinism here costs nothing at scale.
  */
object Canon {
  /** Money: exact 2-decimal values, sums at any realistic sf stay exact. */
  val Money: DecimalType = DecimalType(18, 2)

  def money(c: Column): Column = c.cast(Money)

  /** Integer-valued double (l_quantity). */
  def asLong(c: Column): Column = c.cast(LongType)

  /** Final exact-decimal → double conversion (protocol rule 2). */
  def d(c: Column): Column = c.cast(DoubleType)

  /** avg-style ratio per protocol rule 3. */
  def ratio(num: Column, den: Column): Column =
    num.cast(DoubleType) / den.cast(DoubleType)
}
