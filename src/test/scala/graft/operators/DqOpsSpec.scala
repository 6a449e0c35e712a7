package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Data-quality operators: the profile pair's plan shape (the exact arm
  * must not plan a multi-distinct Expand; the approx arm is one pass) and
  * the HLL arm's accuracy contract against the exact arm.
  */
class DqOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  test("q_dq_profile plans per-column distinct aggregates with no Expand") {
    // the old one-agg-four-count_distincts form planned an Expand that
    // replicated every orders row 5x into the shuffle; the per-column
    // form must not
    val plan = DqOps.qDqProfile(spark, dir).queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"),
      s"exact profile must not plan a multi-distinct Expand:\n$plan")
  }

  test("approx profile raw arm is one scan, no Expand, and lands within 10% of exact") {
    val approxDf = DqOps.qDqProfileApproxRaw(spark, dir)
    val plan = approxDf.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"),
      s"HLL aggregates are plain aggregates; no Expand expected:\n$plan")
    // one pass: exactly one parquet scan of orders in the whole plan
    val nScans = "FileScan parquet".r.findAllIn(plan).size
    assert(nScans == 1, s"approx profile should be a single scan, saw $nScans")

    val exact = DqOps.qDqProfile(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val approx = approxDf.collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (c, ex) =>
      val ap = approx(c)
      assert(math.abs(ap - ex).toDouble <= math.max(1.0, 0.10 * ex),
        s"$c: approx $ap vs exact $ex drifts beyond 10%")
    }
    // the non-distinct facets are identical between the arms
    val exFull = DqOps.qDqProfile(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getString(3), r.getString(4))).toMap
    val apFull = approxDf.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getString(3), r.getString(4))).toMap
    assert(exFull == apFull)
  }

  test("q_dq_profile_approx self-gates: exact counts emitted, HLL verdict true") {
    // the registered query joins the HLL arm against the exact twin and
    // emits a tolerance verdict — fully hash-gated by a deterministic
    // oracle (round 15; previously the one no_oracle row in CORRECTNESS)
    val rows = DqOps.qDqProfileApprox(spark, dir).collect()
    val exact = DqOps.qDqProfile(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(rows.map(_.getString(0)).toSet == exact.keySet)
    rows.foreach { r =>
      assert(r.getLong(2) == exact(r.getString(0)),
        s"${r.getString(0)}: n_distinct_exact must equal the exact twin")
      assert(r.getBoolean(5),
        s"${r.getString(0)}: HLL estimate drifted beyond 5% of exact")
    }
  }
}
