package graft.streaming

import java.nio.file.{Files, Path}

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.core.Variables
import graft.ds.{DataSourceRegistry, FileDataSource, FsDataSource, SparkDataSource}
import graft.jobclass.JobContext
import graft.runner.Application

/** Exactly-once semantics of the streaming_load port
  * (reference: jobclass/streaming_load.rb; SURVEY §2.11).
  */
class StreamingLoadSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkTestBase.spark
  private var home: Path = _
  private var fsBase: Path = _
  private var ctx: JobContext = _

  override def beforeAll(): Unit = {
    home = graft.core.TempDirs.create("sl-home")
    fsBase = graft.core.TempDirs.create("sl-fs")
    Files.createDirectories(home.resolve("subsys"))
    Files.createDirectories(fsBase.resolve("queue"))
    spark.sql("CREATE DATABASE IF NOT EXISTS sl")
    spark.sql("DROP TABLE IF EXISTS sl.track")
    spark.sql("CREATE TABLE sl.track (id INT, name STRING) USING parquet")
    val registry = new DataSourceRegistry(Map(
      "sql"  -> new SparkDataSource("sql", spark, "sl"),
      "fs"   -> new FsDataSource("fs", fsBase),
      "file" -> new FileDataSource("file", home)))
    ctx = JobContext(registry, home, "subsys", Variables.empty)
  }

  private def jobText: String =
    """class: streaming_load
      |src-ds: fs
      |queue-path: queue
      |persistent-path: done
      |file-name: "track-%Y%m%d-%Q.json"
      |dest-ds: sql
      |dest-table: sl.track
      |format: json
      |""".stripMargin

  private def runJob(name: String, text: String = jobText) = {
    val p = home.resolve("subsys").resolve(name)
    Files.writeString(p, text)
    Application.runJobFile(p, ctx)
  }

  private def trackCount: Long =
    spark.sql("SELECT count(*) FROM sl.track").head.getLong(0)

  test("loads queue files once, dedups on re-run, dequeues to persistent path") {
    Files.writeString(fsBase.resolve("queue/track-20240807-0001.json"),
      """{"id": 1, "name": "a"}""" + "\n" + """{"id": 2, "name": "b"}""" + "\n")
    Files.writeString(fsBase.resolve("queue/track-20240807-0002.json"),
      """{"id": 3, "name": "c"}""" + "\n")
    Files.writeString(fsBase.resolve("queue/ignore-me.txt"), "junk")

    // load-only first: files stay in the queue but the log dedups them
    val r1 = runJob("sl1.job", jobText + "load-only: true\n")
    assert(r1.success, r1.message)
    assert(trackCount == 3)

    // second run: same files still queued -> load log must prevent a re-load
    val r2 = runJob("sl2.job", jobText + "load-only: true\n")
    assert(r2.success, r2.message)
    assert(trackCount == 3)

    // full run: new file is loaded, all matched files dequeue
    Files.writeString(fsBase.resolve("queue/track-20240808-0003.json"),
      """{"id": 4, "name": "d"}""" + "\n")
    val r3 = runJob("sl3.job")
    assert(r3.success, r3.message)
    assert(trackCount == 4)
    assert(!Files.exists(fsBase.resolve("queue/track-20240807-0001.json")))
    assert(Files.exists(fsBase.resolve("queue/ignore-me.txt"))) // non-matching stays
    // moved under the persistent path
    val moved = Files.walk(fsBase.resolve("done")).iterator()
    var n = 0
    moved.forEachRemaining(f => if (Files.isRegularFile(f)) n += 1)
    assert(n == 3)
  }

  test("dequeue-only moves only load-logged files; unloaded files stay queued") {
    // reference streaming_load.rb:135-153 — dequeue-only partitions the
    // queue against the load log and moves ONLY the loaded side.
    Files.writeString(fsBase.resolve("queue/track-20240809-0009.json"),
      """{"id": 9, "name": "x"}""" + "\n")
    // log it via load-only (stays queued: load-only never dequeues)
    val r0 = runJob("sl4a.job", jobText + "load-only: true\n")
    assert(r0.success, r0.message)
    val before = trackCount
    // a second, never-loaded file must survive dequeue-only
    Files.writeString(fsBase.resolve("queue/track-20240809-0011.json"),
      """{"id": 11, "name": "y"}""" + "\n")
    val r = runJob("sl4.job", jobText + "dequeue-only: true\n")
    assert(r.success, r.message)
    assert(trackCount == before) // dequeue-only never loads
    assert(!Files.exists(fsBase.resolve("queue/track-20240809-0009.json")))
    assert(Files.exists(fsBase.resolve("queue/track-20240809-0011.json")))
    // clean up the unloaded leftover so later tests see a clean queue
    Files.delete(fsBase.resolve("queue/track-20240809-0011.json"))
  }

  test("streaming: true drains the queue via AvailableNow + checkpoint, exactly once") {
    spark.sql("DROP TABLE IF EXISTS sl.strack")
    spark.sql("CREATE TABLE sl.strack (id INT, name STRING) USING parquet")
    Files.createDirectories(fsBase.resolve("squeue"))
    Files.writeString(fsBase.resolve("squeue/track-20240901-0001.json"),
      """{"id": 21, "name": "s1"}""" + "\n")
    val text = """class: streaming_load
      |src-ds: fs
      |queue-path: squeue
      |file-name: "track-%Y%m%d-%Q.json"
      |dest-ds: sql
      |dest-table: sl.strack
      |format: json
      |streaming: true
      |""".stripMargin
    val r1 = runJob("sls1.job", text)
    assert(r1.success, r1.message)
    assert(spark.sql("SELECT count(*) FROM sl.strack").head.getLong(0) == 1)
    // second run: checkpoint remembers the file; a new one is picked up
    Files.writeString(fsBase.resolve("squeue/track-20240901-0002.json"),
      """{"id": 22, "name": "s2"}""" + "\n")
    val r2 = runJob("sls2.job", text)
    assert(r2.success, r2.message)
    assert(spark.sql("SELECT count(*) FROM sl.strack").head.getLong(0) == 2)
    // pattern filter: a non-matching file is ignored
    Files.writeString(fsBase.resolve("squeue/skip-me.json"), """{"id": 99, "name": "no"}""")
    val r3 = runJob("sls3.job", text)
    assert(r3.success, r3.message)
    assert(spark.sql("SELECT count(*) FROM sl.strack").head.getLong(0) == 2)
  }

  test("user SQL transform over the work table ($work_table)") {
    Files.writeString(fsBase.resolve("queue/track-20240810-0010.json"),
      """{"id": 10, "name": "lower"}""" + "\n")
    val before = trackCount
    val r = runJob("sl5.sql.job",
      """/* class: streaming_load
        |src-ds: fs
        |queue-path: queue
        |file-name: "track-%Y%m%d-%Q.json"
        |dest-ds: sql
        |dest-table: sl.track
        |format: json */
        |INSERT INTO $dest_table SELECT id, upper(name) FROM $work_table;""".stripMargin)
    assert(r.success, r.message)
    assert(trackCount == before + 1)
    assert(spark.sql("SELECT name FROM sl.track WHERE id = 10").head.getString(0) == "LOWER")
  }
}
