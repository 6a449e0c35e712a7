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

  test("dropForce finds the LOWERCASED orphan directory of a mixed-case name") {
    // Spark lowercases managed-table directories while scripts keep their
    // case: `DROP TABLE IF EXISTS MyTable` must clear `mytable/` on a
    // case-sensitive filesystem (round-16 ADVICE).
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), "orphan_mixed")
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    spark.sql("DROP TABLE IF EXISTS Orphan_Mixed")
    fs.mkdirs(wh)
    val f = new org.apache.hadoop.fs.Path(wh, "part-00000.parquet")
    fs.create(f).close()
    ds.dropForce(TableSpec.parse("Orphan_Mixed"))
    assert(!fs.exists(wh), "lowercased orphan location must be cleared")
  }

  test("dropForce refuses to purge a same-named directory that is not table data") {
    // Shared-warehouse safety: the purge is keyed on the name alone, so a
    // directory holding anything a table writer would NOT produce must be
    // reported and left intact, never destroyed (round-16 ADVICE).
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), "not_a_table")
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    spark.sql("DROP TABLE IF EXISTS not_a_table")
    fs.mkdirs(wh)
    val f = new org.apache.hadoop.fs.Path(wh, "notes.docx")
    fs.create(f).close()
    ds.dropForce(TableSpec.parse("not_a_table"))
    assert(fs.exists(f), "non-table-data directory must survive dropForce")
    fs.delete(wh, true)
  }

  test("a script ENDING in a drop returns the drop's frame, not the prior one's") {
    spark.sql("DROP TABLE IF EXISTS tail_drop_t")
    val script = new SqlStatement(
      "CREATE TABLE tail_drop_t (x INT) USING parquet;\n" +
      "SELECT 42 AS n;\n" +
      "DROP TABLE IF EXISTS tail_drop_t;").bind(Variables.empty)
    val out = ds.execScript(script)
    // a DROP command frame is empty — returning 42 here would mean the
    // drop never updated `last` (round-16 ADVICE)
    assert(out.exists(_.collect().isEmpty),
      "last statement's (empty) drop frame must win")
    assert(!spark.catalog.tableExists("tail_drop_t"))
  }

  test("a 3-part DROP TABLE IF EXISTS falls back to plain SQL, not ParameterError") {
    // `spark_catalog.default.t3` is valid Spark SQL that TableSpec cannot
    // model; the orphan-cleanup routing must step aside (round-16 ADVICE)
    spark.sql("CREATE TABLE IF NOT EXISTS three_part_t (x INT) USING parquet")
    val script = new SqlStatement(
      "DROP TABLE IF EXISTS spark_catalog.default.three_part_t;")
      .bind(Variables.empty)
    val out = ds.execScript(script)
    assert(out.nonEmpty)
    assert(!spark.catalog.tableExists("three_part_t"))
  }
}
