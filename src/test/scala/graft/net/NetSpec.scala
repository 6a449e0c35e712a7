package graft.net

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{JobResult, ParameterError}

/** Jobnet parsing + DAG order (reference fixtures:
  * test/home/subsys/net1.jobnet:1-3 and nested net2.jobnet — expected
  * order job1,job2,job3,job4; SURVEY §5).
  */
class JobNetSpec extends AnyFunSuite {

  private val ref = JobRef("subsys", "net1", isNet = true)

  test("edge list parse with comments") {
    val net = JobNet.parse("# comment\njob1 -> job2\njob2 -> job3 # tail\n", ref)
    assert(net.edges == Seq(
      (JobRef("subsys", "job1", false), JobRef("subsys", "job2", false)),
      (JobRef("subsys", "job2", false), JobRef("subsys", "job3", false))))
  }

  test("chained edges a -> b -> c") {
    val net = JobNet.parse("a -> b -> c\n", ref)
    assert(net.edges.length == 2)
  }

  test("topological order of a diamond") {
    val net = JobNet.parse("a -> b\na -> c\nb -> d\nc -> d\n", ref)
    val order = new JobDAG(JobNet.flatten(net, _ => fail("no subnets")))
      .sequentialJobs.map(_.name)
    assert(order.head == "a")
    assert(order.last == "d")
    assert(order.toSet == Set("a", "b", "c", "d"))
  }

  test("nested jobnet expands between its neighbors") {
    val root = JobNet.parse("job1 -> *net2\n*net2 -> job4\n", ref)
    val net2 = JobNet.parse("job2 -> job3\n", JobRef("subsys", "net2", isNet = true))
    val order = new JobDAG(JobNet.flatten(root, r => { assert(r.name == "net2"); net2 }))
      .sequentialJobs.map(_.name)
    assert(order == Seq("job1", "job2", "job3", "job4"))
  }

  test("malformed lines are syntax errors, not crashes") {
    intercept[ParameterError](JobNet.parse("->\n", ref))          // lone arrow
    intercept[ParameterError](JobNet.parse("a ->\n", ref))        // trailing arrow
    intercept[ParameterError](JobNet.parse("-> x\n", ref))        // no previous job
    intercept[ParameterError](JobNet.parse("a -> -> b\n", ref))   // empty middle
  }

  test("cycle detection raises") {
    val net = JobNet.parse("a -> b\nb -> a\n", ref)
    intercept[ParameterError] {
      new JobDAG(JobNet.flatten(net, _ => fail())).sequentialJobs
    }
  }

  test("solo node is scheduled") {
    val net = JobNet.parse("only_job\n", ref)
    val order = new JobDAG(JobNet.flatten(net, _ => fail())).sequentialJobs.map(_.name)
    assert(order == Seq("only_job"))
  }
}

/** File queue lifecycle (reference: test/test_filetaskqueue.rb:22-74). */
class TaskQueueSpec extends AnyFunSuite {

  private def ref(n: String) = JobRef("s", n, isNet = false)

  test("memory queue consumes in order, stops on failure") {
    val q = new MemoryTaskQueue
    Seq("a", "b", "c").foreach(n => q.enqueue(ref(n)))
    val ran = scala.collection.mutable.ArrayBuffer.empty[String]
    val r = q.consumeEach { j =>
      ran += j.name
      if (j.name == "b") JobResult.failure("boom") else JobResult.success
    }
    assert(!r.success)
    assert(ran == Seq("a", "b"))
    assert(q.queued.map(_.name) == Seq("b", "c")) // failed job stays at head
  }

  test("file queue persists, restores, resumes after failure") {
    val dir = graft.core.TempDirs.create("q")
    val path = dir.resolve("net.queue")
    val q = new FileTaskQueue(path)
    Seq("a", "b", "c").foreach(n => q.enqueue(ref(n)))
    q.consumeEach(j => if (j.name == "b") JobResult.failure("x") else JobResult.success)
    // a fresh queue restores the remaining jobs from disk
    val q2 = new FileTaskQueue(path)
    assert(q2.queued.map(_.name) == Seq("b", "c"))
    val r2 = q2.consumeEach(_ => JobResult.success)
    assert(r2.success)
    assert(!Files.exists(path)) // drained queue file removed
  }

  test("double lock raises DoubleLockError") {
    val dir = graft.core.TempDirs.create("q")
    val q = new FileTaskQueue(dir.resolve("net.queue"))
    q.lock()
    intercept[graft.core.DoubleLockError] { q.lock() }
    q.unlock()
  }
}

class FileNamePatternSpec extends AnyFunSuite {
  import graft.streaming.FileNamePattern

  test("strftime-ish pattern compiles to regex (reference: test_c_streaming_load.rb:146-152)") {
    val p = FileNamePattern.compile("track-%Y%m%d-%Q.json")
    assert(p.matches("track-20240807-0001.json"))
    assert(p.matches("track-20240807-123456.json"))
    assert(!p.matches("track-2024087-0001.json"))
    assert(!p.matches("track-20240807-0001.json.gz"))
  }

  test("%* wildcard and literal escape") {
    val p = FileNamePattern.compile("a.b-%*.log")
    assert(p.matches("a.b-anything.log"))
    assert(!p.matches("aXb-anything.log"))
  }

  test("unknown directive raises") {
    intercept[ParameterError] { FileNamePattern.compile("%z.json") }
  }
}

class CtTranslatorSpec extends AnyFunSuite {
  import graft.ds.CtTranslator

  test("translates Redshift .ct to Spark DDL (reference: test/home/subsys/users.ct)") {
    val ct = """create table $dest_table
      |( id int encode lzo
      |, name varchar(64) encode lzo
      |, created date
      |, updated_at timestamp
      |, n bigint
      |, s smallint
      |)
      |distkey (id)
      |sortkey (created, id)
      |;""".stripMargin
    val out = CtTranslator.translate(ct, Some("app.users"))
    assert(out.createSql.contains("CREATE TABLE app.users"))
    assert(out.createSql.contains("USING parquet"))
    assert(!out.createSql.toLowerCase.contains("encode"))
    assert(!out.createSql.toLowerCase.contains("distkey"))
    assert(out.createSql.contains("STRING"))
    assert(out.distKey.contains("id"))
    assert(out.sortKeys == Seq("created", "id"))
  }
}
