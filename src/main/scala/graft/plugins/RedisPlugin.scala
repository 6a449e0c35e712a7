package graft.plugins

import org.apache.spark.sql.functions._

import graft.core._
import graft.ds.DataSource
import graft.jobclass._

/** Out-of-core `redis-export` job class mirroring the bricolage-redis
  * plugin's surface (fixtures: test/home/subsys/redis_export.job,
  * redis_export2.job): export a table to a key-value store, one key per
  * row built from `prefix` + the key columns, encoded either as a redis
  * hash (one field per non-key column) or a single JSON value, with an
  * optional TTL.
  *
  * Spark-first shape: the export runs as `foreachPartition` — one client
  * per partition, writes pipelined within the partition — which is exactly
  * how a real redis/memcache bulk export scales (no driver collection, no
  * shuffle; the table streams out of the executors). The client behind
  * [[KvsClient]] is pluggable; this zero-egress build ships an in-process
  * store ([[InProcessKvs]]) as the test double where the gem ships a
  * redis connection.
  */
object RedisPlugin {

  def register(): Unit = JobClass.register(RedisExportJobClass)

  /** Minimal KVS surface of the export (hset/set/expire). */
  trait KvsClient {
    def hset(key: String, fields: Map[String, String]): Unit
    def set(key: String, value: String): Unit
    def expire(key: String, seconds: Long): Unit
  }

  /** In-process store keyed by datasource name — the pluggable stand-in
    * for a network client. Works under local[*] (executors share the JVM);
    * a cluster deployment swaps in a real client factory per partition.
    */
  object InProcessKvs {
    private val stores =
      new java.util.concurrent.ConcurrentHashMap[String,
        java.util.concurrent.ConcurrentHashMap[String, (Any, Option[Long])]]()

    private def store(ds: String) =
      stores.computeIfAbsent(ds, _ => new java.util.concurrent.ConcurrentHashMap())

    def client(ds: String): KvsClient = new KvsClient {
      // Redis HSET merges only into an existing hash; a prior string value
      // is replaced (Redis raises WRONGTYPE — overwriting keeps the test
      // double from crashing partitions on mixed-encode reruns)
      def hset(key: String, fields: Map[String, String]): Unit =
        store(ds).merge(key, (fields, None), (old, _) => old._1 match {
          case m: Map[_, _] =>
            (m.asInstanceOf[Map[String, String]] ++ fields, old._2)
          case _ => (fields, None)
        })
      // Redis SET discards any TTL on the key
      def set(key: String, value: String): Unit =
        store(ds).put(key, (value, None))
      def expire(key: String, seconds: Long): Unit =
        store(ds).computeIfPresent(key, (_, old) => (old._1, Some(seconds)))
    }

    def get(ds: String, key: String): Option[(Any, Option[Long])] =
      Option(store(ds).get(key))
    def keys(ds: String): Seq[String] = {
      import scala.jdk.CollectionConverters._
      store(ds).keySet().asScala.toSeq.sorted
    }
    def clear(ds: String): Unit = store(ds).clear()
  }

  /** `redis`-typed datasource: names the target store. */
  final class KvsDataSource(val name: String) extends DataSource

  object RedisExportJobClass extends JobClass("redis-export") {
    val params: Seq[Param] = Seq(
      DataSourceParam("spark", "src-ds"),
      SrcTableParam(),
      DataSourceParam("redis", "dest-ds"),
      StringParam("prefix", optional = true),
      StringListParam("key-column"),
      EnumParam("encode", Seq("hash", "json"), Some("hash")),
      IntParam("expire"), // TTL seconds; must be positive
    )
    def build(p: ParamValues, vars: Variables, ctx: JobContext): Seq[Action] = {
      val src = ctx.registry.spark(p.string("src-ds"))
      val destName = p.string("dest-ds")
      val srcTables = p("src-tables").asInstanceOf[Map[String, TableSpec]]
      val prefix = p.stringOpt("prefix").map(vars.expand).getOrElse("")
      val keyCols = p("key-column").asInstanceOf[Seq[String]]
      val encode = p.string("encode")
      val expire = p.longOpt("expire")
      Seq(Action("redis-export") {
        ctx.registry.get(destName) // fail fast on an unconfigured store
        val table = srcTables.values.headOption.getOrElse(
          throw new ParameterError("redis-export: src-tables required"))
        val df = src.table(table)
        val valueCols = df.columns.filterNot(keyCols.contains).toSeq
        // key = prefix + key columns joined with '_' (reference plugin's
        // composite-key form); value columns ride along as strings
        val keyed = df.select(
          concat(lit(prefix) +:
            keyCols.flatMap(c => Seq(col(c).cast("string"), lit("_"))).dropRight(1): _*)
            .as("_kvs_key"),
          struct(valueCols.map(c => col(c).cast("string").as(c)): _*).as("_kvs_val"),
          to_json(struct(df.columns.map(col).toSeq: _*)).as("_kvs_json"))
        keyed.foreachPartition {
          (rows: Iterator[org.apache.spark.sql.Row]) =>
            // one client per partition; writes pipeline within the partition
            val client = InProcessKvs.client(destName)
            rows.foreach { r =>
              val key = r.getString(0)
              encode match {
                case "hash" =>
                  val s = r.getStruct(1)
                  val fields = s.schema.fieldNames.zipWithIndex.map {
                    case (f, i) => f -> (if (s.isNullAt(i)) null else s.getString(i))
                  }.toMap
                  client.hset(key, fields)
                case "json" =>
                  client.set(key, r.getString(2))
              }
              expire.foreach(client.expire(key, _))
            }
        }
      })
    }
  }
}
