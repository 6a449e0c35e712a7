package graft.ds

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** distkey → bucketed-table co-location: a join on the bucket key of two
  * bucketed tables must run WITHOUT a shuffle exchange (the physical
  * payoff of Redshift DISTKEY semantics on Spark).
  */
class BucketingSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("ct distkey/sortkey emit Spark bucketing DDL") {
    val t = CtTranslator.translate(
      """create table sales (
        |  id bigint encode lzo,
        |  cust int,
        |  amount bigint
        |) distkey(cust) sortkey(id);""".stripMargin)
    assert(t.createSql.contains("CLUSTERED BY (cust) SORTED BY (id) INTO 8 BUCKETS"))
    assert(!t.createSql.toLowerCase.contains("encode"))
    assert(t.distKey.contains("cust"))
  }

  test("joining two bucketed tables on the bucket key needs no shuffle") {
    import spark.implicits._
    spark.sql("CREATE DATABASE IF NOT EXISTS bkt")
    spark.sql("DROP TABLE IF EXISTS bkt.a")
    spark.sql("DROP TABLE IF EXISTS bkt.b")
    spark.sql(CtTranslator.translate(
      "create table bkt.a (k int, va bigint) distkey(k);").createSql)
    spark.sql(CtTranslator.translate(
      "create table bkt.b (k int, vb bigint) distkey(k);").createSql)
    (1 to 1000).map(i => (i % 50, i.toLong)).toDF("k", "va")
      .write.mode("append").insertInto("bkt.a")
    (1 to 1000).map(i => (i % 50, i.toLong * 2)).toDF("k", "vb")
      .write.mode("append").insertInto("bkt.b")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bkt.a").join(spark.table("bkt.b"), "k")
      assert(joined.count() == 20000) // 20 per key per side, 50 keys
      val shuffles = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(shuffles.isEmpty,
        s"expected bucket-co-located join, found shuffles:\n${joined.queryExecution.executedPlan}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("groupBy on the bucket key needs no shuffle") {
    val agg = spark.table("bkt.a").groupBy("k").count()
    assert(agg.count() == 50)
    val shuffles = agg.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }
    assert(shuffles.isEmpty)
  }
}
