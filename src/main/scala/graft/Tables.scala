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

  // Timestamp-bearing columns per table: every one of these is exposed
  // to the same drift the r6 testdata regen hit on events.ts (INT64
  // TIMESTAMP(NANOS) vs TIMESTAMP(MICROS) vs TIMESTAMP_NTZ), so all get
  // the same normalization, not just the one that has already broken.
  private val tsColumns: Map[String, Seq[String]] = Map(
    "events" -> Seq("ts"),
    "lineitem" -> Seq("l_shipdate"),
    "orders" -> Seq("o_orderdate"))

  // Session-level execution tuning, applied once per session (keyed by
  // the session object) the first time any query touches a table.
  private val tuned =
    java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]())

  private def applySessionTuning(spark: SparkSession): Unit =
    if (tuned.add(spark)) {
      // The bounded typed Aggregators (TopKAggregator / MinKAggregator)
      // plan as ObjectHashAggregateExec, which silently falls back to
      // SORT-based aggregation after only 128 distinct keys per task
      // (spark.sql.objectHashAggregate.sortBased.fallbackThreshold
      // default). For the kNN-graph builds that aggregate a
      // cell-blocked pair stream down to k rows per node, the fallback
      // turns a size-k-heap-per-key hash pass into a full sort of every
      // scored pair WITH per-row buffer serialization — measured 221×
      // time for 100× pairs on q_pagerank at sf10 before this. Each
      // buffer is a ≤k-tuple vector (~300 B), so 1M keys per task is
      // ~300 MB worst-case — far under executor memory at any partition
      // sizing this engine produces, and partitions passing 1M distinct
      // group keys should be split wider anyway.
      spark.conf.set(
        "spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
    }

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    applySessionTuning(spark)
    readCache.computeIfAbsent((spark, dir, name), { _ =>
      if (tsColumns.contains(name)) {
        // these tables have shipped timestamps as parquet INT64
        // TIMESTAMP(NANOS) (which Spark's vectorized reader rejects —
        // hence nanosAsLong) and as native TIMESTAMP(MICROS); repair
        // whatever the file carries. Only `events` additionally casts
        // NTZ to session-TZ timestamp (its consumers are windows /
        // watermarks); lineitem/orders keep NTZ as read — a cast there
        // would wrap the column and break parquet filter pushdown on
        // every date predicate.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        tsColumns(name).foldLeft(spark.read.parquet(s"$dir/$name.parquet"))(
          (df, c) => normalizeTs(df, c, castNtz = name == "events"))
      } else if (name == "embeddings") {
        normalizeEmbedding(spark.read.parquet(s"$dir/$name.parquet"))
      } else spark.read.parquet(s"$dir/$name.parquet")
    })
  }

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

  /** Normalize a timestamp column to TimestampType regardless of how the
    * parquet encoded it: INT64 nanos-as-long (legacy driver testdata),
    * TIMESTAMP_NTZ (pandas micros without timezone), or already TIMESTAMP.
    * The session runs in UTC, so the NTZ cast is instant-preserving and
    * matches what the DuckDB oracle sees reading the same file.
    */
  def normalizeTs(df: DataFrame, c: String, castNtz: Boolean = true): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    df.schema(c).dataType match {
      case LongType if castNtz =>
        df.withColumn(c, expr(s"timestamp_micros($c div 1000)"))
      case LongType =>
        // non-events (lineitem/orders): land on TIMESTAMP_NTZ, the same
        // type the NTZ-vintage files read as natively, so the column type
        // doesn't vary by testdata vintage. Pushdown on the wrapped column
        // is lost in this vintage regardless (the file carries raw INT64
        // nanos); the castNtz=false contract only promises pushdown on
        // the NTZ/native vintages, where the column is untouched.
        df.withColumn(c,
          expr(s"cast(timestamp_micros($c div 1000) as timestamp_ntz)"))
      case TimestampNTZType if castNtz =>
        df.withColumn(c, col(c).cast("timestamp"))
      case _ => df
    }
  }

  /** Back-compat alias for the events-specific form (streaming readers
    * normalize through this after providing the batch-resolved schema).
    */
  def normalizeEventsTs(df: DataFrame): DataFrame = normalizeTs(df, "ts")

  // Memoized per (dir, name): footer counts are immutable for a testdata
  // layout, and several queries re-derive the same corpus size.
  private val countCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), java.lang.Long]()

  /** Exact row count of `<dir>/<name>.parquet` from parquet FOOTER record
    * counts, read on the driver — no Spark job. Several operators derive
    * scale-adaptive parameters from an UNFILTERED table count (containment
    * df cap, recall probe modulus, label-prop plane count, tf-idf corpus
    * size); `t(...).count()` for that scalar paid a full job-scheduling
    * round trip per query for metadata every scan reads anyway. Handles
    * both testdata layouts (single file / directory of part files) through
    * the Hadoop FS API, so non-local schemes keep working. Identical to
    * `t(spark, dir, name).count()` by parquet's own contract: footers
    * carry the exact record count per file.
    */
  def rowCount(spark: SparkSession, dir: String, name: String): Long =
    countCache.computeIfAbsent((dir, name), { _ =>
      val conf = spark.sparkContext.hadoopConfiguration
      val root = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
      val fs = root.getFileSystem(conf)
      def rows(p: org.apache.hadoop.fs.Path): Long = {
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getRecordCount finally r.close()
      }
      val st = fs.getFileStatus(root)
      if (st.isDirectory)
        fs.listStatus(root).iterator
          .filter(f => f.isFile && {
            val n = f.getPath.getName
            !n.startsWith("_") && !n.startsWith(".") && n.endsWith(".parquet")
          })
          .map(f => rows(f.getPath)).sum
      else rows(root)
    })

  /** Register every testdata table as a temp view for spark.sql use. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}
