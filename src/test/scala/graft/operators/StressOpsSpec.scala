package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.Tables.t

/** Skew-stress operators: the salted join must be plan-only (same result
  * as the unsalted join) while actually joining on the widened key.
  */
class StressOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  test("salted join equals the unsalted join per key") {
    val salted = StressOps.qStressSaltedJoin(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val fact = t(spark, dir, "events").select(
      expr("CASE WHEN event_id % 2 = 0 THEN 0 ELSE user_id % 50 END").as("k"),
      (col("event_id") % 1000).as("measure"))
    val dim = fact.select("k").distinct()
      .withColumn("attr", col("k") + 1L)
    val plain = fact.join(dim, Seq("k"))
      .groupBy("k")
      .agg(count(lit(1)).as("n_events"),
        sum(col("measure") * col("attr")).as("weighted"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(salted == plain, "salting changed the join result")
  }

  test("salted join plan keys the exchange on (k, salt), not k alone") {
    val plan = StressOps.qStressSaltedJoin(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected pinned SMJ:\n$plan")
    assert(plan.contains("salt"), s"salt key absent from the plan:\n$plan")
  }
}
