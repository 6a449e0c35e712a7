package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    // optional 3rd arg: comma-separated query-name filter for local
    // iteration (the driver always passes exactly two args)
    val only: Option[Set[String]] =
      args.lift(2).map(_.split(",").map(_.trim).toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    var nOk, nFail, nZero = 0
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        // empty-dump tripwire: a query that silently returns zero rows
        // (dead stream source, bad glob, pruned-to-nothing scan) writes a
        // valid parquet file and sails through "0 failed" — the sf1 audit
        // shipped SEVEN empty streaming dumps that way. Reading the dump
        // back is O(result), trivially cheap next to running the query.
        if (spark.read.parquet(s"$outDir/$name").isEmpty) {
          nZero += 1
          System.err.println(s"[verify] ZERO-ROWS $name: dump is empty")
        }
        nOk += 1
      } catch { case e: Throwable =>
        nFail += 1
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // release per-query persisted tables (signature/hash caches whose
      // lifetime belongs to the caller) AND RDD-level blocks — the
      // iterative operators localCheckpoint per round, and those blocks
      // are invisible to catalog.clearCache()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // visible tally: a query that throws is otherwise just ABSENT from
    // the driver's correctness JSON (round 6 lost 24 queries to a
    // testdata schema drift with no loud signal anywhere)
    println(s"[verify] dumped $nOk queries, $nFail failed" +
      (if (nZero > 0) s", $nZero ZERO-ROWS (suspicious — see stderr)" else ""))
    spark.stop()
  }
}
