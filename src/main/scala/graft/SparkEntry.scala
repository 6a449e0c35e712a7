package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{AsOfJoin, ClusterOps, CorpusOps, CurationOps, DataMovement, Dedup, DqOps, LakeOps, LayoutOps, Multimodal, Relational, ScaleOps, Similarity, SketchOps, StreamOps, StressOps, TextOps, WarehouseOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every implemented operator's QueryDef into the driver's
  * queries/oracleSql maps. Each operator object owns both the Spark-first
  * DataFrame implementation and (where SQL-expressible) the DuckDB oracle,
  * keeping the two adjacent so column aliases stay in lock step.
  */
object SparkEntry {

  val allQueries: Seq[QueryDef] =
    Relational.all ++ TextOps.all ++ Dedup.all ++ Similarity.all ++
      Multimodal.all ++ DataMovement.all ++ AsOfJoin.all ++ CorpusOps.all ++
      StressOps.all ++ ClusterOps.all ++ SketchOps.all ++ LayoutOps.all ++
      CurationOps.all ++ StreamOps.all ++ LakeOps.all ++ ScaleOps.all ++
      WarehouseOps.all ++ DqOps.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q5RegionRevenue(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
