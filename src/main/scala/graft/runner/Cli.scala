package graft.runner

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.SparkSession

import graft.core.{EmbeddedFunctions, JobFile, JobResult, ParameterError, Variables}
import graft.ds.{DataSourceRegistry, FileDataSource, FsDataSource, SparkDataSource}
import graft.jobclass.JobContext
import graft.net.{FileTaskQueue, MemoryTaskQueue, TaskQueue}

/** CLI entry points mirroring the reference's two binaries
  * (`bin/bricolage` → Application.main, application.rb:37-91;
  * `bin/bricolage-jobnet` → JobNetRunner.main, jobnetrunner.rb:40-93).
  *
  * Context loading (reference: lib/bricolage/context.rb:96-133):
  * `<home>/datasource.yml` configures datasources (defaults provided),
  * `<home>/variable.yml` and `<home>/<subsys>/variable.yml` add global
  * variables (ERB-style `<%= %>` helpers preprocessed).
  */
object Cli {

  def buildSpark(appName: String): SparkSession = {
    val s = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName(appName)
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_SHUFFLE_PARTITIONS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def environment: String = sys.env.getOrElse("BRICOLAGE_ENV", "development")

  /** Config search paths for a basename (reference: filesystem.rb:126-128
    * config_pathes — `config/<name>` then `config/<env>/<name>`; the home
    * root is accepted too for flat layouts).
    */
  def configPaths(home: Path, basename: String): Seq[Path] =
    Seq(home.resolve("config").resolve(basename),
      home.resolve("config").resolve(environment).resolve(basename),
      home.resolve(basename))

  /** Variable layering (reference: context.rb:96-133 +
    * load_variables_for_all_scopes): builtin vars < bricolage.yml (system
    * options) < variable.yml, each layered `config/` < `config/<env>/` <
    * home root < subsystem dir (later wins); all files are
    * ERB-preprocessed.
    */
  def loadVariables(home: Path, subsys: String): Variables = {
    def fromFile(p: Path): Variables =
      if (!Files.exists(p)) Variables.empty
      else Variables.fromMap(
        JobFile.parseYamlMap(EmbeddedFunctions.preprocess(Files.readString(p),
            graft.core.ErbContext(Some(home), Some(p.getParent))))
          .map { case (k, v) => k -> String.valueOf(v) })
    def scoped(basename: String): Variables = {
      val layers = configPaths(home, basename) ++
        (if (subsys.isEmpty) Nil else Seq(home.resolve(subsys).resolve(basename)))
      layers.map(fromFile).reduce(_.union(_))
    }
    val builtin = Variables(
      "bricolage_env" -> environment,
      "bricolage_home" -> home.toString)
    builtin.union(scoped("bricolage.yml")).union(scoped("variable.yml"))
  }

  def loadContext(home: Path, subsys: String, spark: => SparkSession): JobContext = {
    // datasource.yml with database.yml fallback, each searched through the
    // config paths; password.yml entries merge into the same-named
    // datasource configs (reference: datasource.rb:10-22,32-50
    // DataSourceFactory.load over context.config_pathes)
    val dsFile = Seq("datasource.yml", "database.yml")
      .flatMap(configPaths(home, _)).find(Files.exists(_))
    val registry = dsFile match {
      case Some(f) =>
        var config = JobFile.parseYamlMap(Files.readString(f))
        val pwFile = configPaths(home, "password.yml").find(Files.exists(_))
        pwFile.foreach { pf =>
          val passwords = JobFile.parseYamlMap(Files.readString(pf))
          config = config.map {
            case (name, conf: Map[_, _]) if passwords.contains(name) =>
              name -> (conf.asInstanceOf[Map[String, Any]] +
                ("password" -> passwords(name)))
            case other => other
          }
        }
        DataSourceRegistry.fromConfig(config, spark)
      case None =>
        new DataSourceRegistry(Map(
          "sql"  -> new SparkDataSource("sql", spark, "default"),
          "fs"   -> new FsDataSource("fs", home),
          "file" -> new FileDataSource("file", home)))
    }
    JobContext(registry, home, subsys, loadVariables(home, subsys))
  }

  final case class Options(
      home: Path,
      varAssigns: Variables,
      jobOptions: Map[String, String],
      queuePath: Option[Path],
      dbQueuePath: Option[Path],
      enableQueue: Boolean,
      clearQueue: Boolean,
      unlockJobnet: Boolean,
      dryRun: Boolean,
      target: Option[Path])

  /** Parse `[--home=PATH] [-v name=value]... [--opt=value]... [--queue=PATH]
    * [--db-queue=PATH] [--clear-queue] [--dry-run] file`.
    */
  def parseArgs(args: Seq[String]): Options = {
    var home = Paths.get(sys.env.getOrElse("BRICOLAGE_HOME", "."))
    var vars = Variables.empty
    var jobOpts = Map.empty[String, String]
    // env layer between defaults and cmdline (reference:
    // jobnetrunner.rb:246-257 BRICOLAGE_QUEUE_PATH / BRICOLAGE_ENABLE_QUEUE)
    var queue: Option[Path] = sys.env.get("BRICOLAGE_QUEUE_PATH").map(Paths.get(_))
    var dbQueue: Option[Path] = None
    var enableQ = sys.env.contains("BRICOLAGE_ENABLE_QUEUE")
    var clear = false
    var unlock = false
    var dry = false
    var target: Option[Path] = None
    val it = args.iterator
    while (it.hasNext) {
      it.next() match {
        case a if a.startsWith("--home=") => home = Paths.get(a.drop(7))
        case "-v" =>
          if (!it.hasNext) throw new ParameterError("-v requires name=value")
          val kv = it.next()
          kv.split("=", 2) match {
            case Array(k, v) => vars = vars.add(k, v)
            case _ => throw new ParameterError(s"bad -v argument: $kv")
          }
        case a if a.startsWith("--queue=") => queue = Some(Paths.get(a.drop(8)))
        case a if a.startsWith("--db-queue=") => dbQueue = Some(Paths.get(a.drop(11)))
        case "-Q" | "--enable-queue" => enableQ = true
        case "--disable-queue" => enableQ = false; queue = None
        case "--clear-queue" => clear = true
        case "--unlock-jobnet" => unlock = true
        case "--dry-run" | "-n" => dry = true
        case a if a.startsWith("--") && a.contains("=") =>
          val Array(k, v) = a.drop(2).split("=", 2)
          jobOpts += (k -> v)
        case a if a.startsWith("--") => jobOpts += (a.drop(2) -> "true")
        case a if target.isEmpty => target = Some(Paths.get(a))
        case a => throw new ParameterError(s"unexpected argument: $a")
      }
    }
    Options(home, vars, jobOpts, queue, dbQueue, enableQ, clear, unlock, dry, target)
  }
}

/** `runMain graft.runner.BricolageMain [options] job-file` — run ONE job. */
object BricolageMain {
  /** Testable core: returns the process exit code (0/1/2,
    * reference: jobresult.rb:26-28). `sparkOverride` lets tests inject a
    * shared session instead of building one.
    */
  def run(args: Seq[String],
      sparkOverride: Option[SparkSession] = None): Int = {
    val args1 = JobListener.fireOptionParsing(JobListener.registered, args)
    val opts = Cli.parseArgs(args1)
    val jobPath = opts.target.getOrElse(
      throw new ParameterError("usage: BricolageMain [options] job-file"))
    // subsystem = the job file's parent directory name under home
    val subsys = Option(jobPath.toAbsolutePath.getParent)
      .filter(_ != opts.home.toAbsolutePath)
      .map(_.getFileName.toString).getOrElse("")
    lazy val spark = sparkOverride.getOrElse(
      Cli.buildSpark(s"graft-${jobPath.getFileName}"))
    val ctx = Cli.loadContext(opts.home, subsys, spark)
    if (opts.dryRun) {
      val jf = JobFile.load(jobPath)
      new Job(jobPath.getFileName.toString, jf, ctx, opts.jobOptions, opts.varAssigns,
        Some(jobPath.toAbsolutePath))
        .compile().foreach(a => println(a))
      return 0
    }
    val result = Application.runJobFile(jobPath, ctx, opts.jobOptions, opts.varAssigns)
    if (!result.success) System.err.println(result.message)
    result.exitCode
  }

  def main(args: Array[String]): Unit = sys.exit(run(args.toSeq))
}

/** `runMain graft.runner.JobNetMain [options] net-file` — run a DAG. */
object JobNetMain {
  def run(args: Seq[String],
      sparkOverride: Option[SparkSession] = None): Int = {
    val args1 = JobListener.fireOptionParsing(JobListener.registered, args)
    val opts = Cli.parseArgs(args1)
    val netPath = opts.target.getOrElse(
      throw new ParameterError("usage: JobNetMain [options] jobnet-file"))
    val subsys = Option(netPath.toAbsolutePath.getParent)
      .filter(_ != opts.home.toAbsolutePath)
      .map(_.getFileName.toString).getOrElse("")
    lazy val spark = sparkOverride.getOrElse(
      Cli.buildSpark(s"graft-net-${netPath.getFileName}"))
    val ctx = Cli.loadContext(opts.home, subsys, spark)
    val queue: TaskQueue = (opts.dbQueuePath, opts.queuePath) match {
      case (Some(db), _) =>
        // DB-backed queue (reference: taskqueue.rb:175-310 DatabaseTaskQueue
        // via --enable-queue): executions + locks live in the database, so
        // a second runner on the same jobnet is excluded and a restart
        // resumes the unfinished executions
        val store = graft.net.JdbcExecutionStore.embedded(db)
        val jobnetId = (if (subsys.isEmpty) "" else subsys + "/") +
          netPath.getFileName.toString.stripSuffix(".jobnet")
        val executorId = java.net.InetAddress.getLocalHost.getHostName +
          ":" + ProcessHandle.current().pid()
        if (opts.clearQueue) store.cancelJobnet(jobnetId, "cleared by --clear-queue")
        // a dead runner's lock can only be released by the operator
        // (its executor_id pid is gone): --unlock-jobnet takes it over
        // while keeping all recorded progress
        if (opts.unlockJobnet) store.forceUnlock(jobnetId)
        val q = new graft.net.DatabaseTaskQueue(store, jobnetId, executorId,
          enableLock = true)
        q.restoreJobnet()
        q
      case (None, Some(p)) =>
        // --clear-queue discards persisted progress before restore
        // (reference: jobnetrunner.rb:63-66)
        if (opts.clearQueue) Files.deleteIfExists(p)
        new FileTaskQueue(p)
      case (None, None) if opts.enableQueue =>
        // derived file-queue path under the local state dir (reference:
        // jobnetrunner.rb:127-134 get_queue_file_path —
        // <state>/queue/<app>.<jobnet-id-dotted>)
        val jobnetId = (if (subsys.isEmpty) "" else subsys + ".") +
          netPath.getFileName.toString.stripSuffix(".jobnet")
        val p = opts.home.resolve(".bricolage").resolve("queue")
          .resolve(s"graft.$jobnetId.queue")
        if (opts.clearQueue) Files.deleteIfExists(p)
        new FileTaskQueue(p)
      case (None, None) => new MemoryTaskQueue
    }
    val result = new JobNetRunner(ctx).run(netPath, queue, opts.varAssigns)
    if (!result.success) System.err.println(result.message)
    result.exitCode
  }

  def main(args: Array[String]): Unit = sys.exit(run(args.toSeq))
}
