package graft.jobclass

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.core.Variables
import graft.ds.{DataSourceRegistry, FileDataSource, FsDataSource, SparkDataSource}
import graft.runner.Application

/** UNLOAD option-bag parity (reference: psqldatasource.rb:441-469). */
class UnloadOptionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkTestBase.spark
  private var home: Path = _
  private var ctx: JobContext = _

  override def beforeAll(): Unit = {
    home = graft.core.TempDirs.create("unload-home")
    Files.createDirectories(home.resolve("subsys"))
    spark.sql("DROP TABLE IF EXISTS unload_src")
    spark.sql("CREATE TABLE unload_src (id INT, name STRING) USING parquet")
    spark.sql("INSERT INTO unload_src VALUES (1, 'alpha'), (2, 'beta')")
    val registry = new DataSourceRegistry(Map(
      "sql"  -> new SparkDataSource("sql", spark, "default"),
      "fs"   -> new FsDataSource("fs", home),
      "file" -> new FileDataSource("file", home)))
    ctx = JobContext(registry, home, "subsys", Variables.empty)
  }

  private def unload(name: String, dest: String, format: String,
      options: String): Unit = {
    val p = home.resolve("subsys").resolve(name)
    Files.writeString(p,
      s"""/* class: unload
         |dest-file: $dest
         |format: $format
         |options:
         |$options */
         |SELECT id, name FROM unload_src ORDER BY id;""".stripMargin)
    val r = Application.runJobFile(p, ctx)
    assert(r.success, r.message)
  }

  private def outFiles(dir: String): Seq[Path] =
    Files.list(home.resolve(dir)).iterator.asScala
      .filter { f =>
        val n = f.getFileName.toString
        Files.isRegularFile(f) && !n.startsWith("_") && !n.startsWith(".")
      }
      .toSeq.sortBy(_.toString)

  test("a script ending in DROP fails loudly instead of exporting an empty frame") {
    // since round 16 a bare DROP updates the script's last-result frame
    // (restoring pre-routing semantics); a zero-column export is never
    // what an unload meant, so the jobclass rejects it instead of
    // silently writing an empty dataset to dest
    val p = home.resolve("subsys").resolve("u_drop.sql.job")
    Files.writeString(p,
      """/* class: unload
        |dest-file: out_drop
        |format: csv */
        |SELECT id, name FROM unload_src ORDER BY id;
        |DROP TABLE IF EXISTS unload_scratch_nonexistent;""".stripMargin)
    val r = Application.runJobFile(p, ctx)
    assert(!r.success, "unload of a trailing DROP's frame must fail")
    assert(r.message.contains("returned no columns"), r.message)
  }

  test("gzip writes .gz part files that read back identically") {
    unload("u_gz.sql.job", "out_gz", "csv", "    gzip: true")
    assert(outFiles("out_gz").nonEmpty)
    assert(outFiles("out_gz").forall(_.getFileName.toString.endsWith(".gz")),
      outFiles("out_gz").map(_.getFileName).mkString(","))
    val back = spark.read.schema("id INT, name STRING")
      .csv(home.resolve("out_gz").toString)
    assert(back.count() == 2)
  }

  test("header + delimiter override") {
    unload("u_hd.sql.job", "out_hd", "csv", "    header: true\n    delimiter: \"|\"")
    val lines = outFiles("out_hd").flatMap(f => Files.readAllLines(f).asScala)
    assert(lines.contains("id|name"))
    assert(lines.contains("1|alpha"))
  }

  test("parallel off coalesces to a single part file") {
    unload("u_p1.sql.job", "out_p1", "tsv", "    parallel: \"off\"")
    assert(outFiles("out_p1").size == 1)
    val lines = Files.readAllLines(outFiles("out_p1").head).asScala
    assert(lines.head == "1\talpha")
  }

  test("addquotes quotes every field") {
    unload("u_q.sql.job", "out_q", "csv", "    addquotes: true")
    val lines = outFiles("out_q").flatMap(f => Files.readAllLines(f).asScala)
    assert(lines.contains("\"1\",\"alpha\""))
  }

  test("partitions N writes exactly N objects (the queue-depth knob)") {
    // 2 rows into 2 files: round-robin repartition spreads them 1/1
    unload("u_n.sql.job", "out_n", "parquet", "    partitions: 2")
    assert(outFiles("out_n").size == 2, outFiles("out_n").mkString(","))
    val back = spark.read.parquet(home.resolve("out_n").toString)
    assert(back.count() == 2)
  }

  test("partitions rejects a non-positive or non-numeric value") {
    val p = home.resolve("subsys").resolve("u_bad.sql.job")
    Files.writeString(p,
      """/* class: unload
        |dest-file: out_bad
        |format: parquet
        |options:
        |    partitions: zero */
        |SELECT id, name FROM unload_src;""".stripMargin)
    val r = Application.runJobFile(p, ctx)
    assert(!r.success)
    assert(r.message.contains("partitions"))
  }
}
