package graft.ds

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.core.{SqlStatement, TableSpec, Variables}

/** SparkDataSource primitives that interact with the persistent warehouse
  * across JVM lifetimes: the session catalog is in-memory per process
  * while `spark-warehouse/` persists, so a managed table from a PRIOR
  * process is an orphaned directory this catalog can't see — and a
  * setup script's drop/create pair must still be idempotent (round 15;
  * the pipeline jobnet's rerun-in-an-existing-warehouse case).
  */
class DataSourceSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private lazy val ds = new SparkDataSource("sql", spark, "default")

  test("dropForce clears an orphaned managed location left by a prior JVM") {
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), "orphan_t")
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate the prior process: a location on disk, no catalog entry
    spark.sql("DROP TABLE IF EXISTS orphan_t")
    fs.mkdirs(wh)
    assert(fs.exists(wh))
    ds.dropForce(TableSpec.parse("orphan_t"))
    assert(!fs.exists(wh), "orphan location must be cleared")
    // and the create that used to die with LOCATION_ALREADY_EXISTS works
    spark.sql("CREATE TABLE orphan_t (x INT) USING parquet")
    spark.sql("DROP TABLE orphan_t")
  }

  test("execScript routes DROP TABLE IF EXISTS through orphan cleanup") {
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), "orphan_s")
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    spark.sql("DROP TABLE IF EXISTS orphan_s")
    fs.mkdirs(wh)
    val script = new SqlStatement(
      "DROP TABLE IF EXISTS orphan_s;\n" +
      "CREATE TABLE orphan_s (x INT) USING parquet;\n" +
      "SELECT count(*) AS n FROM orphan_s;").bind(Variables.empty)
    val out = ds.execScript(script)
    assert(out.exists(_.collect().head.getLong(0) == 0L))
    spark.sql("DROP TABLE orphan_s")
  }

  test("dropForce leaves a live managed table's data to the normal drop") {
    spark.sql("DROP TABLE IF EXISTS live_t")
    spark.sql("CREATE TABLE live_t (x INT) USING parquet")
    spark.sql("INSERT INTO live_t VALUES (1)")
    ds.dropForce(TableSpec.parse("live_t"))
    assert(!spark.catalog.tableExists("live_t"))
    // recreate: the managed drop removed the location, orphan path unused
    spark.sql("CREATE TABLE live_t (x INT) USING parquet")
    spark.sql("DROP TABLE live_t")
  }
}
