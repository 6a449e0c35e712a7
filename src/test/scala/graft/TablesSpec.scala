package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Testdata drift repair: the driver regenerates the parquet tables each
  * round and the timestamp encoding has already shifted once (r6: 24
  * queries lost to INT64-nanos events.ts). These pin the repair rules.
  */
class TablesSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("normalizeTs repairs an INT64-nanos column, landing on the same type per branch") {
    import spark.implicits._
    // 2024-08-07 10:00:00 UTC in nanoseconds
    val ns = 1723024800L * 1000000000L
    val df = Seq(ns).toDF("ts")
    // castNtz=false (lineitem/orders): nanos land on TIMESTAMP_NTZ — the
    // SAME type the NTZ-vintage files read as natively, so the column
    // type doesn't vary by testdata vintage (round-8 advice fix)
    val out = Tables.normalizeTs(df, "ts", castNtz = false)
    assert(out.schema("ts").dataType == TimestampNTZType)
    val got = out.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
      .head().getString(0)
    assert(got == "2024-08-07 10:00:00")
    // castNtz=true (events): nanos land on session-TZ TIMESTAMP
    val outTz = Tables.normalizeTs(df, "ts", castNtz = true)
    assert(outTz.schema("ts").dataType == TimestampType)
    assert(outTz.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
      .head().getString(0) == "2024-08-07 10:00:00")
  }

  test("normalizeTs casts NTZ only when asked (pushdown stays intact otherwise)") {
    val ntz = spark.sql(
      "SELECT CAST('2024-08-07 10:00:00' AS TIMESTAMP_NTZ) AS ts")
    assert(Tables.normalizeTs(ntz, "ts", castNtz = true)
      .schema("ts").dataType == TimestampType)
    assert(Tables.normalizeTs(ntz, "ts", castNtz = false)
      .schema("ts").dataType == TimestampNTZType)
    // already-TIMESTAMP columns pass through untouched
    val tz = spark.sql("SELECT CAST('2024-08-07 10:00:00' AS TIMESTAMP) AS ts")
    assert(Tables.normalizeTs(tz, "ts").schema("ts").dataType == TimestampType)
  }

  test("embedding normalization yields array<float> regardless of source width") {
    val f64 = spark.sql("SELECT CAST(array(1.0, 2.0) AS ARRAY<DOUBLE>) AS embedding")
    val out = Tables.normalizeEmbedding(f64)
    assert(out.schema("embedding").dataType.simpleString == "array<float>")
  }

  test("first table read raises the ObjectHashAggregate fallback threshold") {
    // The bounded top-k Aggregators plan as ObjectHashAggregateExec, which
    // silently degrades to sort-based aggregation (full sort of every
    // scored pair + per-row buffer serialization) after only 128 distinct
    // keys per task — measured 221x time for 100x pairs on q_pagerank at
    // sf10 before Tables.t started raising the threshold per session.
    Tables.t(spark, "/root/testdata/sf0.001", "region").count()
    assert(spark.conf.get(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold") == "1000000")
  }
}
