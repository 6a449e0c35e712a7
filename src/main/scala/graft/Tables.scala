package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A declared query: Spark-side DataFrame builder + optional DuckDB oracle
  * SQL over the same parquet tables. Column names/aliases MUST match between
  * the two (the driver sorts columns by name before hashing).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Parquet table access for the driver testdata layout (TESTDATA.md).
  *
  * Mirrors the reference's table resolution, where a `TableSpec` name pair
  * resolves to a warehouse table (reference: lib/bricolage/sqlstatement.rb:302-349);
  * here a bare table name resolves to `<sfDir>/<name>.parquet`.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  // Memoized per (session, dir, name): `spark.read.parquet` re-lists the
  // directory and re-reads footers on every call; reusing the resolved
  // DataFrame shares one FileIndex/schema across all queries of a run
  // (plans are immutable, so sharing is safe).
  private val readCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    readCache.computeIfAbsent((spark, dir, name), { _ =>
      if (name == "events") {
        // events.ts is parquet INT64 TIMESTAMP(NANOS), which Spark's vectorized
        // reader rejects; read the raw nanos and truncate to microseconds
        // (what every micro-precision engine, incl. the oracle, compares at).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.read.parquet(s"$dir/$name.parquet")
          .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      } else spark.read.parquet(s"$dir/$name.parquet")
    })

  /** Register every testdata table as a temp view for spark.sql use. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}
