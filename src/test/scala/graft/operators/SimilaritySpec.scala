package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Triangle-blocked near-dup join: exactness across block counts. */
class SimilaritySpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  test("blocked self-join yields the identical pair set for any block count") {
    def rows(blocks: Int): Seq[String] =
      Similarity.qEmbeddingNearDup(spark, dir, blocks)
        .collect().map(_.mkString("|")).toSeq
    val naive = rows(1) // one block = the plain same-label self-join
    assert(naive.nonEmpty)
    assert(rows(4) == naive)
    assert(rows(7) == naive) // block count not dividing the cell evenly
  }

  test("pair generation keys on (label, lo, hi) — the bounded-task shape") {
    val plan = Similarity.qEmbeddingNearDup(spark, dir, 4)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("lo") && plan.contains("hi"))
  }
}
