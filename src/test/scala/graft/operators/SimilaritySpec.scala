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

  test("power-iteration step returns a unit vector matching a driver-side fold") {
    val rows = Similarity.qPowerIteration(spark, dir).collect()
    val dims = rows.map(_.getLong(0))
    assert(dims.head == 1 && dims.length == dims.distinct.length)
    // normalized output has unit L2 norm (up to the 4dp rounding)
    val norm = math.sqrt(rows.map(r => r.getDouble(2) * r.getDouble(2)).sum)
    assert(math.abs(norm - 1.0) < 0.01, s"|v1| = $norm")
    // exact integer check: recompute y = (X^T X) v0 with the same
    // fixed-point fold on the driver
    val vecs = graft.Tables.t(spark, dir, "embeddings")
      .select("embedding").collect().map(_.getSeq[Float](0))
    val expected = Array.ofDim[Long](dims.length)
    vecs.foreach { v =>
      val x4 = v.map(x => math.round(x.toDouble * 10000)).toArray
      val s = x4.sum
      var d = 0
      while (d < expected.length) { expected(d) += s * x4(d); d += 1 }
    }
    rows.foreach { r =>
      assert(r.getLong(1) == expected(r.getLong(0).toInt - 1),
        s"dim ${r.getLong(0)}: y mismatch")
    }
  }

  test("feature-norm covers every dimension with sane moments") {
    val rows = Similarity.qFeatureNorm(spark, dir).collect()
    val d = graft.Tables.t(spark, dir, "embeddings")
      .selectExpr("size(embedding)").head().getInt(0)
    assert(rows.length == d, s"expected $d dims, got ${rows.length}")
    val n = graft.Tables.t(spark, dir, "embeddings").count()
    rows.foreach { r =>
      assert(r.getDouble(2) > 0, s"dim ${r.getLong(0)}: std must be positive")
      // |z|>3 holds for well under half of any sample (Chebyshev: <= n/9)
      assert(r.getLong(3) <= n / 9 + 1, s"dim ${r.getLong(0)}: too many outliers")
    }
  }
}
