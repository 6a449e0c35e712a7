package graft

import org.apache.spark.sql.SparkSession

/** Run a single SparkEntry query by name and print its wall time — the
  * iteration loop for per-query performance work without paying a full
  * Bench sweep. Usage:
  *
  *   sbt "runMain graft.RunOne q_dedup_clusters /root/testdata/sf0.1 [n]"
  *
  * Runs one untimed warmup at sf0.001 (same policy as [[Bench]]) then `n`
  * timed runs (default 3) and prints each plus the min.
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val n = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query: $name (have: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")})"))
    try fn(spark, "/root/testdata/sf0.001").count() catch { case _: Throwable => () }
    spark.catalog.clearCache()
    val times = (1 to n).map { i =>
      val t0 = System.nanoTime()
      val rows = fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache() // outside the timed window (see Bench)
      println(f"[runone] $name run $i: $sec%.3f s ($rows rows)")
      sec
    }
    println(f"[runone] $name min: ${times.min}%.3f s")
    spark.stop()
  }
}
