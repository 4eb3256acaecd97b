package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Schemas, Tables}

/** Pin the §1.3 load-time schema assertion: real testdata loads clean;
  * deliberately mis-typed parquet fails with a named-column diagnosis
  * (the r9 incident surfaced as 35 cryptic analysis errors instead). */
class SchemasSpec extends AnyFunSuite {
  test("all declared tables load and pass the schema assertion") {
    Schemas.declared.keys.foreach { t =>
      assert(Tables.t(TestSpark.spark, TestSpark.Sf, t).schema.nonEmpty)
    }
  }

  test("events.ts normalizes to session-TZ TimestampType") {
    val dt = Tables.events(TestSpark.spark, TestSpark.Sf).schema("ts").dataType
    assert(dt == org.apache.spark.sql.types.TimestampType, dt.toString)
  }

  test("mis-typed column fails fast with a named-column message") {
    val s = TestSpark.spark
    val dir = java.nio.file.Files.createTempDirectory("drift").toString
    // 'events' with ts as a String — drift that must be caught at load
    Tables.events(s, TestSpark.Sf)
      .withColumn("ts", col("ts").cast("string"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalArgumentException](Tables.t(s, dir, "events"))
    assert(e.getMessage.contains("events.ts"), e.getMessage)
    assert(e.getMessage.contains("drift"), e.getMessage)
  }

  test("raw-Long timestamp is tolerated ONLY for events.ts (the one " +
       "column with a nanos normalizer)") {
    val s = TestSpark.spark
    val dir = java.nio.file.Files.createTempDirectory("drift3").toString
    // orders with o_orderdate as epoch-long: the exact r9 drift class on
    // a column Tables does NOT normalize — must fail with the name
    Tables.t(s, TestSpark.Sf, "orders")
      .withColumn("o_orderdate",
        unix_micros(col("o_orderdate").cast("timestamp")))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val e = intercept[IllegalArgumentException](Tables.t(s, dir, "orders"))
    assert(e.getMessage.contains("orders.o_orderdate"), e.getMessage)
  }

  test("missing/renamed column fails fast naming the column sets") {
    val s = TestSpark.spark
    val dir = java.nio.file.Files.createTempDirectory("drift2").toString
    Tables.t(s, TestSpark.Sf, "documents").drop("lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val e = intercept[IllegalArgumentException](Tables.t(s, dir, "documents"))
    assert(e.getMessage.contains("documents"), e.getMessage)
    assert(e.getMessage.contains("lang"), e.getMessage)
  }
}
