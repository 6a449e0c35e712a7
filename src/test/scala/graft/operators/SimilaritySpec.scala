package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Triangle-blocked near-dup join: exactness across block counts. */
class SimilaritySpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  test("blocked self-join yields the identical pair set for any block target") {
    def rows(blockTarget: Long): Seq[String] =
      Similarity.qEmbeddingNearDup(spark, dir, blockTarget)
        .collect().map(_.mkString("|")).toSeq
    val naive = rows(Long.MaxValue) // every cell below target → B=1 everywhere
    assert(naive.nonEmpty)
    assert(rows(2L) == naive) // forces multi-block cells at sf0.001
    assert(rows(3L) == naive) // block count not dividing the cell evenly
  }

  test("pair generation keys on (label, lo, hi) — the bounded-task shape") {
    val plan = Similarity.qEmbeddingNearDup(spark, dir, 2L)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("lo") && plan.contains("hi"))
  }

  test("ann candidate join keys on (label, bucket) and is a strict subset of the exact pairs") {
    val ann = Similarity.qAnnNearDup(spark, dir)
    val plan = ann.queryExecution.optimizedPlan.toString
    assert(plan.contains("bucket"))
    assert(!plan.contains("CartesianProduct"))
    val annPairs = ann.collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    val exact = Similarity.qEmbeddingNearDup(spark, dir)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(annPairs.nonEmpty)
    assert(annPairs.subsetOf(exact)) // approximate recall, exact precision
  }
}
