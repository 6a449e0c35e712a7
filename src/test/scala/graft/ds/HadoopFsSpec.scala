package graft.ds

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.core.Variables
import graft.jobclass.JobContext
import graft.runner.Application

/** HadoopFsDataSource over a file: URI exercises the exact FileSystem code
  * path an s3a:// base takes on a cluster: ops parity with FsDataSource,
  * and the streaming_load job class running end-to-end over it.
  */
class HadoopFsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("put/list/get/move/delete over a file: URI") {
    val dir = graft.core.TempDirs.create("hfs")
    val hfs = new HadoopFsDataSource("h", "file:" + dir.toString)
    val local = Files.createTempFile("hfs-local", ".txt")
    Files.writeString(local, "payload")
    hfs.put(local, "in/a/one.txt")
    hfs.put(local, "in/two.txt")
    assert(hfs.listRelative("in") == Seq("in/a/one.txt", "in/two.txt"))
    assert(new String(hfs.get("in/two.txt")) == "payload")
    assert(hfs.urlString("in/two.txt").startsWith("file:"))
    hfs.move("in/two.txt", "done/two.txt")
    assert(hfs.listRelative("in") == Seq("in/a/one.txt"))
    assert(hfs.listRelative("done") == Seq("done/two.txt"))
    hfs.move("in/missing.txt", "done/na.txt") // tolerated
    hfs.delete("done/two.txt")
    assert(hfs.listRelative("done").isEmpty)
  }

  test("streaming_load runs end-to-end over the Hadoop store") {
    val fsBase = graft.core.TempDirs.create("hfs-sl")
    Files.createDirectories(fsBase.resolve("queue"))
    Files.writeString(fsBase.resolve("queue/ev-20240807-01.json"),
      """{"id":1,"name":"a"}""" + "\n")
    spark.sql("CREATE DATABASE IF NOT EXISTS hsl")
    spark.sql("DROP TABLE IF EXISTS hsl.t")
    spark.sql("DROP TABLE IF EXISTS hsl.t_l")
    spark.sql("CREATE TABLE hsl.t (id INT, name STRING) USING parquet")
    val home = graft.core.TempDirs.create("hfs-home")
    Files.createDirectories(home.resolve("ss"))
    val ctx = JobContext(
      new DataSourceRegistry(Map(
        "sql" -> new SparkDataSource("sql", spark, "hsl"),
        "fs"  -> new HadoopFsDataSource("fs", "file:" + fsBase.toString))),
      home, "ss", Variables.empty)
    val job = home.resolve("ss/hsl.job")
    Files.writeString(job,
      """class: streaming_load
        |src-ds: fs
        |queue-path: queue
        |persistent-path: done
        |file-name: "ev-%Y%m%d-%Q.json"
        |dest-ds: sql
        |dest-table: hsl.t
        |format: json
        |""".stripMargin)
    assert(Application.runJobFile(job, ctx).success)
    assert(spark.sql("SELECT count(*) FROM hsl.t").head.getLong(0) == 1)
    // file dequeued to persistent path; re-run loads nothing new
    assert(Files.exists(fsBase.resolve("done/ev-20240807-01.json")))
    assert(Application.runJobFile(job, ctx).success)
    assert(spark.sql("SELECT count(*) FROM hsl.t").head.getLong(0) == 1)
  }
}
