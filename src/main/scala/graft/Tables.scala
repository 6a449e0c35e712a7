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
        // events.ts has shipped as both parquet INT64 TIMESTAMP(NANOS)
        // (which Spark's vectorized reader rejects — hence nanosAsLong)
        // and as native TIMESTAMP(MICROS); normalize whatever the file
        // carries to a session-TZ micro-precision timestamp.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        normalizeEventsTs(spark.read.parquet(s"$dir/$name.parquet"))
      } else if (name == "embeddings") {
        normalizeEmbedding(spark.read.parquet(s"$dir/$name.parquet"))
      } else spark.read.parquet(s"$dir/$name.parquet")
    })

  /** Normalize `embeddings.embedding` to array<float> — the type every
    * vector kernel (vec_dot/vec_norm, PQ, IVF) binds to. The driver
    * regenerates testdata between rounds and pandas/arrow writers have
    * shipped float64 lists for the same logical column before (the
    * events-ts drift in round 6 cost 24 queries); the cast is a no-op on
    * the current files.
    */
  def normalizeEmbedding(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    df.schema("embedding").dataType match {
      case ArrayType(FloatType, _) => df
      case _ => df.withColumn("embedding", col("embedding").cast("array<float>"))
    }
  }

  /** Normalize the events `ts` column to TimestampType regardless of how
    * the parquet encoded it: INT64 nanos-as-long (legacy driver testdata),
    * TIMESTAMP_NTZ (pandas micros without timezone), or already TIMESTAMP.
    * The session runs in UTC, so the NTZ cast is instant-preserving and
    * matches what the DuckDB oracle sees reading the same file.
    */
  def normalizeEventsTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp"))
      case _                => df
    }
  }

  /** Register every testdata table as a temp view for spark.sql use. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}
